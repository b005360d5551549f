"""Regenerate PLANS.md: the physical plans of the headline queries.

Run from the repo root:  python tools/dump_plans.py

The point of the artifact: the *plan* is the deliverable at 100 TB — this
file is the reviewed, version-controlled record of what each headline query
compiles to (broadcasts, pushed filters, pruned schemas, partial aggs,
heap-based top-k), with the properties that tests/test_plans.py enforces.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMMENTARY = {
    "q1_pricing_summary": "Pushed shipdate filter; partial HashAggregate before the 6-group exchange; decimal sums stay inside codegen.",
    "q3_shipping_priority": "Filtered customer broadcast; orders/lineitem filters pushed to scans; TakeOrderedAndProject for the top-10.",
    "q5_region_revenue": "region→nation→customer dim chain and supplier broadcast; only orders⨝lineitem shuffles.",
    "drone_features_flat": "Entirely narrow (no Exchange): the full A3-A17 feature build is one codegen'd projection.",
    "filter_in_between_like": "All predicates in PushedFilters; ReadSchema pruned to referenced columns.",
    "sort_limit": "TakeOrderedAndProject — per-partition heaps, no global sort.",
    "window_topk_per_group": "Single shuffle on the partition key; rank filter applied inside the window stage.",
    "sessionize_events": "session_window aggregation — one shuffle on user_id.",
    "sim_topk_bruteforce": "Broadcast 1-row query vector; cosine scoring is a narrow codegen'd pass; heap top-k.",
    "text_token_freq": "explode is narrow; one shuffle on token for the two-level agg.",
    "dedup_minhash": "Persisted shingle-hash relation; band-bucket equi-join (SortMergeJoin), never a pair-space product.",
    "join_skewed_salted": "Salt column in the join keys: the 90%-one-key fact side spreads over 16 shards; dim exploded ×16 (broadcast at this SF — the salted keys matter when the dim outgrows the threshold).",
    "q2_min_cost_supplier": "Correlated min as rank-1 WindowGroupLimit over the single-pass join web (per-partition top-1 heaps before the shuffle); top-100 heap.",
    "q4_order_priority": "LeftSemi on orderkey with the cross-side 90-day residual inside the join condition; quarter filter pushed to the orders scan.",
    "q9_product_profit": "LIKE-filtered part broadcast into lineitem; supplier/nation broadcast; profit expression one codegen'd project; dsum partials before the 2-key exchange.",
    "q21_waiting_suppliers": "EXISTS/NOT-EXISTS decorrelated to a two-level pair aggregate; the order rollup carries the single flagged supplier's id+count (r17), so lineitem is scanned ONCE and the pair relation shuffles once; top-100 heap.",
    "graph_pagerank": "Edge derivation collapses to catalog cardinality before the loop; the 5-round job (r12 pinned adjacency) plans every loop join as ShuffledHashJoin with ONE exchange per round — the checkpointed edge relation is consumed in place, no per-round sort (pinned by tests/test_plans.py).",
    "graph_sssp": "Delta Bellman-Ford (r13): each round SHUFFLE_HASH joins only the improved-node frontier against the stationary weighted adjacency; the dist/messages merge is one tagged-union map-combined groupBy — exactly ONE exchange per round, plan-pinned.",
    "text_bpe_tokenize": "One narrow projection: 41 nested replace() calls over the marker-encoded doc state — no Exchange, no Python, the whole encoder inside whole-stage codegen.",
    "multimodal_decode_flac": "Arrow mapInPandas decode pipeline — scan, rebalance-if-undersplit, one Python stage; CRC-verified lossless decode inside the batch.",
    "multimodal_decode_msadpcm": "Arrow mapInPandas decode pipeline — scan, rebalance-if-undersplit, one Python stage; no shuffle after the spread.",
    "scd2_point_in_time": "lag + lead + row_number share one (user_id, ts) sort; PIT join is equi on user with the validity-interval residual.",
    "hierarchy_flatten": "Pointer doubling: the plan shows the final doubled state reading checkpointed RDDs — each round was ONE equi-shuffle of the node relation on the ancestor pointer.",
    "events_anomaly_mad": "Weighted median + binned MAD selection behind ONE up-front user_id repartition (r17): every downstream aggregate/window/join reuses that partitioning (zero ENSURE_REQUIREMENTS shuffles; AQE dedupes the repeated exchange subtree at runtime).",
    "agg_exact_quantiles": "ONE exchange serves the window sort and the final rollup; the quantile explode happens after ranking and collapses immediately.",
    "sketch_theta_kmv": "WindowGroupLimit pushes the k-minimum selection into each sort partial (asserted on the pre-checkpoint sketch build); downstream math touches only k-row sketches.",
    "ml_ols_regression": "One partial-aggregable shuffle computes all 10 fixed-point moments; coefficients are a projection (<=2 exchanges incl. the output sort).",
    "multimodal_decode_bmp": "Arrow mapInPandas decode; binary column shed after feature extraction like the other codec tiers.",
    "graph_triangle_count": "Edges scope-persisted across three join roles; wedge join + closing probe are equi-shuffles on part keys; top-20 via TakeOrderedAndProject.",
    "table_time_travel": "Reads exactly the v2 manifest's files — the plan is a plain pruned parquet scan; no log replay.",
    "stream_sketch_kmv": "Post-drain read of the committed k*|types|-row state table + re-rank; the streaming merges happened at write time.",
    "dedup_editdistance": "Deletion-variant explode, self equi-join on the variant string, distinct before the levenshtein filter — no pair-space product.",
    "multimodal_decode_gif": "Rebalanced synthesis, one Arrow mapInPandas pass; the binary column dies at the feature boundary.",
    "multimodal_decode_ulaw": "Same Arrow audio path as PCM; mu-law expands via a 256-entry table lookup inside the batch. Exchange-free (r17: the synth spread was measured pure overhead and removed).",
    "multimodal_gif_frame_sample": "Animated-GIF container walk + strided per-frame decode in one Arrow pass.",
}


def main() -> None:
    from etl_drone_sense_spark.plans.registry import REGISTRY, all_queries
    from etl_drone_sense_spark.session import get_spark

    all_queries()
    spark = get_spark("plan-dump", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"

    out = [
        "# PLANS — physical plans of the headline (bench) queries",
        "",
        "Generated by `python tools/dump_plans.py` (sf0.001 inputs; plan shape is",
        "SF-independent). Plan properties are enforced by `tests/test_plans.py`.",
        "",
    ]
    for name, spec in sorted(REGISTRY.items()):
        if not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", ""]
        if name in COMMENTARY:
            out += [COMMENTARY[name], ""]
        out += ["```", buf.getvalue().rstrip(), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")


if __name__ == "__main__":
    main()
