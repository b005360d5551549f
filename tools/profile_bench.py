"""Per-query profiling harness for the r16 optimization round.

Usage:  python tools/profile_bench.py [--plans-dir plans/r16] [--suffix before]
                                      [--samples 3] [name ...]

For each named bench query (default: all bench queries):
  * warms it once at sf0.001 (JVM/codegen),
  * times `samples` noop-sink runs at $SPARK_GRAFT_SF_DIR (median reported),
  * writes `.explain("formatted")` to <plans-dir>/<name>_<suffix>.txt.

Prints one JSON line per query: {"name": ..., "median_s": ..., "samples": [...]}.
The explain dump is captured from the UNEXECUTED plan (AdaptiveSparkPlan
initial form) — the same artifact tests/test_plans.py asserts against.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_drone_sense_spark.caching import release_caches  # noqa: E402
from etl_drone_sense_spark.plans.registry import bench_queries  # noqa: E402
from etl_drone_sense_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans-dir", default=None,
                    help="directory for explain dumps (omit = no dumps)")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        print(
            f"bench dir {sf_dir!r} missing — set SPARK_GRAFT_SF_DIR to a "
            "fixture directory (e.g. .../sf0.1)",
            file=sys.stderr,
        )
        return 2
    # warm on the smallest sibling SF of the bench dir rather than a
    # hard-coded absolute path (r16 ADVICE): falls back to the bench dir
    # itself when no smaller sibling exists
    root = os.path.dirname(sf_dir.rstrip("/"))
    sibs = sorted(
        (d for d in os.listdir(root or ".")
         if d.startswith("sf") and os.path.isdir(os.path.join(root, d))),
        key=lambda d: float(d[2:]) if d[2:].replace(".", "").isdigit() else 1e9,
    )
    warm_dir = os.path.join(root, sibs[0]) if sibs else sf_dir
    spark = get_spark(app_name="etl-drone-sense-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")

    queries = bench_queries()
    names = args.names or sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    def run(fn, d):
        fn(spark, d).write.mode("overwrite").format("noop").save()
        release_caches()

    for name in names:
        fn = queries[name]
        if args.plans_dir:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            release_caches()
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"),
                "w", encoding="utf-8",
            ) as f:
                f.write(buf.getvalue())
        if not args.no_warm and os.path.isdir(warm_dir):
            run(fn, warm_dir)
        samples = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            run(fn, sf_dir)
            samples.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({
            "name": name,
            "median_s": round(statistics.median(samples), 3),
            "samples": samples,
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
