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

# Per-query time budgets at sf0.1 / local[32]: 1.8× the best median
# observed across rounds 3-4 (floor +0.6 s so sub-second queries don't
# trip on scheduler noise; the machine's documented run-to-run variance
# is ±0.5 s). A breach prints a LOUD stderr warning and lands in the
# JSON's budget_violations — drift has to be explained, not discovered
# two rounds later (r4 VERDICT item 2). Queries added later get a budget
# when they first appear in a recorded BENCH_r{N}.json.
BUDGETS_S: dict[str, float] = {
    "cdc_snapshot_diff": 1.12,
    "corpus_prepare_pipeline": 4.30,
    "dedup_exact_substring": 3.93,  # r5: 1.8 × 2.18 s quiet-machine median
    "dedup_embedding_lsh": 2.39,
    "dedup_embedding_lsh_adaptive": 2.41,  # r6: 1.8 × 1.34 s quiet median
    "dedup_incremental": 2.01,
    "dedup_minhash": 1.87,
    "dedup_paragraph": 1.64,
    "dedup_semantic": 2.01,
    "drone_features_flat": 1.22,
    "events_gapfill": 1.14,
    "events_pattern_match": 1.02,
    "filter_in_between_like": 0.88,
    "join_skewed_salted": 1.38,
    "merge_upsert": 1.00,
    "multimodal_decode": 0.93,
    "q1_pricing_summary": 1.50,
    "q3_shipping_priority": 1.18,
    "q5_region_revenue": 1.37,
    "q8_market_share": 1.90,  # r5: 1.8 × 1.05 s quiet-machine median
    "q18_large_volume": 1.87,  # r5: 1.8 × 1.04 s quiet-machine median
    "sample_importance": 2.50,
    "sessionize_events": 0.98,
    "sim_topk_bruteforce": 0.83,
    "text_bigram_lm": 3.34,
    "text_boilerplate_strip": 2.47,
    "text_repetition": 2.95,
    "text_token_freq": 0.93,
    "text_winnowing": 1.01,
    "window_topk_per_group": 0.90,
}


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

    violations = {
        name: {"sec": t, "budget": BUDGETS_S[name]}
        for name, t in timings.items()
        if name in BUDGETS_S and t > BUDGETS_S[name] and sf_val == 0.1
    }
    for name, v in sorted(violations.items()):
        print(
            f"BUDGET EXCEEDED: {name} took {v['sec']:.3f}s"
            f" (budget {v['budget']:.2f}s at sf0.1)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "budget_violations": violations,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
