"""Engine-only timing audit: run EVERY registry query at a scale factor
(default sf0.1) through the noop sink and report per-query seconds.

Usage: python tools/audit_all.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from etl_drone_sense_spark.caching import release_caches  # noqa: E402
from etl_drone_sense_spark.plans.registry import all_queries  # noqa: E402
from etl_drone_sense_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="audit-all")
    spark.sparkContext.setLogLevel("ERROR")
    timings = {}
    t_all = time.perf_counter()
    for name, fn in all_queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        release_caches()
        timings[name] = round(time.perf_counter() - t0, 2)
    total = round(time.perf_counter() - t_all, 1)
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.2f}  {name}")
    print(json.dumps({"total_sec": total, "n_queries": len(timings)}))


if __name__ == "__main__":
    main()
