"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion with the ``noop`` sink: unlike
``count()`` — whose plan column-prunes the projections away (a narrow
transform would time as a bare parquet row-count) — noop materializes
every output column on executors without shipping rows to the driver.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from etl_drone_sense_spark.caching import release_caches
from etl_drone_sense_spark.plans.registry import bench_queries
from etl_drone_sense_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="etl-drone-sense-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = bench_queries()
    # JVM/codegen warm-up on the smallest fixture so headline timings
    # measure steady-state execution, not first-call compilation.
    warm_dir = "/root/testdata/sf0.001"

    def run(fn, d):
        fn(spark, d).write.mode("overwrite").format("noop").save()
        release_caches()  # don't let one query's scoped caches skew the next

    if os.path.isdir(warm_dir):
        for fn in queries.values():
            run(fn, warm_dir)

    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(fn, sf_dir)
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
