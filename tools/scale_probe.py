"""Scale-slope probe (r4 VERDICT item 7): the 100 TB claim rests on plan
shapes; this measures it. Synthesize ~10× the sf0.1 documents/embeddings
fixtures (every top-cost bench query reads only those two tables), run
the 5 most expensive bench queries at both scales, and assert time grows
≲ linearly — a hidden driver-side loop or quadratic pair blowup shows up
as a slope far above the data ratio.

Replicas are NEAR-duplicates on purpose (a ``repN`` suffix token / a
perturbed first component): a dup-heavy corpus is the realistic hard case
for the dedup queries, and pair counts must stay LINEAR in replica count
for the LSH/semantic paths to be scale-honest.

Writes BENCH_sf1.json at the repo root:
  {"sf_base": 0.1, "scale": 10, "queries":
     {name: {"base_s": .., "scaled_s": .., "slope": ..}}, "max_slope": ..}

Scratch data lands under .scale_probe/ (gitignored). Run standalone:
    python tools/scale_probe.py [--scale 10] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".scale_probe")
PROBE_QUERIES = [
    "corpus_prepare_pipeline",
    "text_bigram_lm",
    "dedup_embedding_lsh",
    "sample_importance",
    "text_repetition",
    # r5 addition: hashed-span ExactSubstr — the dup-heavy replica corpus
    # multiplies every shared span's occupancy by the replica count, so a
    # superlinear slope here would expose a hidden pair blowup in the
    # span-hash groupBy/semi-join (the shape is designed to stay linear).
    "dedup_exact_substring",
]
# 10x data on 32 local cores: allow sublinear-parallelism overhead but
# catch anything superlinear (VERDICT's "slope <= ~15x for 10x data").
MAX_SLOPE_FACTOR = 1.5

# Pair-emission queries whose OUTPUT grows quadratically in duplicate-
# cluster DEPTH by construction: the probe fixture deliberately deepens
# every text-dup cluster ~10x (the " repN" replicas — the dup-heavy hard
# case), so each base doc gains 10 near-copies whose simhash fingerprints
# are identical and a CORRECT pair-emitter must emit ~C(11,2)/C(1,1) ≈
# 50-100x the pairs. A raw time-vs-data slope punishes correctness; for
# these, the probe also measures OUTPUT rows at both scales and holds
# time-per-output-row ("work_slope" = slope / output_ratio) to the
# limit. Everything else keeps the raw slope gate. (dedup_minhash's raw
# slope stays under the limit because its sf0.1 output is already
# replica-pair-dominated; it is listed for the same honest metric.)
PAIR_EMITTERS = {
    "dedup_simhash_adaptive",
    "dedup_minhash",
    # r12: the edit-distance join keys on the first 24 chars of the
    # text, and the dup-deepened replicas differ only in their SUFFIX —
    # every replica of a doc shares the key exactly, so the true ≤1-edit
    # pair set grows quadratically in replica depth by construction;
    # time-per-output-row is the honest gate, same as the LSH emitters.
    "dedup_editdistance",
    # r11 (r10 VERDICT item 3): the capped twin exists precisely for the
    # dup-heavy case — its per-bucket cap bounds the output class, so its
    # output ratio should sit FAR below the uncapped twin's ~149× while
    # time-per-output-row stays linear; measuring both here is the
    # evidence the cap delivers what it promises.
    "dedup_simhash_adaptive_capped",
}


def synthesize(spark, scale: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"sf1_x{scale}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    embs = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    doc_off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    vec_off = embs.agg(F.max("vec_id")).collect()[0][0] + 1

    reps = spark.range(scale).withColumnRenamed("id", "_rep")
    big_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_rep") * doc_off).alias("doc_id"),
            # replica 0 is the original; others are near-duplicates
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("_rep")))
            .alias("text"),
            "lang",
            "source",
            F.length(
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" rep"), F.col("_rep"))
                )
            ).alias("n_chars"),
        )
        .repartition(32)
    )
    big_docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    # Replica r's embedding is the base vector ROTATED by r positions: an
    # isometry, so each replica reproduces the base corpus's near-dup
    # structure exactly, while cross-replica cosines are ~random. That
    # models real growth — 10x data is 10x more dup CLUSTERS of constant
    # depth. (Deepening every cluster 10x instead makes pair-emission
    # output quadratic BY CONSTRUCTION and measures the workload, not the
    # plan: first probe run showed 28x slope from exactly that.)
    dim = len(embs.select("embedding").first()[0])
    big_embs = (
        embs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("_rep") * vec_off).alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {dim - 1}),"
                f" i -> element_at(embedding, int((i + _rep) % {dim}) + 1))"
            ).alias("embedding"),
            "label",
        )
        .repartition(32)
    )
    big_embs.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    return out


def synthesize_full(spark, scale: int) -> str:
    """ALL ten fixture tables at ``scale``× sf0.1 — the full-registry
    certification fixture (r5 VERDICT item 1), not just the two tables the
    top-cost probe needs.

    Replication rules (constant-cluster-depth principle throughout —
    growth adds more INDEPENDENT structure, never deepens existing
    structure, which would measure the workload rather than the plan):

    * region/nation — broadcast dims, copied unchanged;
    * customer/supplier/part — keys offset per replica (``k + rep*K``)
      so each replica is its own keyspace;
    * orders/lineitem — fact keys offset AND foreign keys offset by the
      SAME per-table bases, so referential integrity holds within every
      replica (the join graph's selectivities are scale-invariant);
    * events — ids/users offset (user offset = the customer offset, so
      stream_static_enrich's FK holds) and ts shifted +32 days per
      replica: each replica is its own month, so window/session/interval
      state and join output grow LINEARLY with data (same-ts duplication
      would grow interval-join output quadratically by construction);
    * documents/embeddings — same near-dup/rotated-isometry scheme as
      ``synthesize``.
    """
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"sf1_full_x{scale}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.isfile(marker):
        return out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(scale).withColumnRenamed("id", "_rep")

    def rd(t):
        return spark.read.parquet(f"{BASE_SF}/{t}.parquet")

    def off(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    def wr(df, t, parts=32):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )

    for t in ("region", "nation"):
        rd(t).write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))

    cust, supp, part, orders, li, ev = (
        rd(t) for t in ("customer", "supplier", "part", "orders", "lineitem", "events")
    )
    c_off, s_off, p_off, o_off, e_off = (
        off(cust, "c_custkey"),
        off(supp, "s_suppkey"),
        off(part, "p_partkey"),
        off(orders, "o_orderkey"),
        off(ev, "event_id"),
    )

    def rep_keys(df, key_offsets: dict[str, int], extra=None):
        cols = []
        for c in df.columns:
            if c in key_offsets:
                cols.append(
                    (F.col(c) + F.col("_rep") * key_offsets[c]).alias(c)
                )
            elif extra and c in extra:
                cols.append(extra[c].alias(c))
            else:
                cols.append(F.col(c))
        return df.crossJoin(F.broadcast(reps)).select(*cols)

    wr(rep_keys(cust, {"c_custkey": c_off}), "customer", 8)
    wr(rep_keys(supp, {"s_suppkey": s_off}), "supplier", 4)
    wr(rep_keys(part, {"p_partkey": p_off}), "part", 8)
    wr(rep_keys(orders, {"o_orderkey": o_off, "o_custkey": c_off}), "orders", 16)
    wr(
        rep_keys(
            li,
            {"l_orderkey": o_off, "l_partkey": p_off, "l_suppkey": s_off},
        ),
        "lineitem",
    )
    wr(
        rep_keys(
            ev,
            {"event_id": e_off, "user_id": c_off},
            extra={
                "ts": F.timestamp_add("DAY", F.col("_rep") * 32, F.col("ts"))
            },
        ),
        "events",
        16,
    )

    # documents/embeddings reuse the probe synthesizer's scheme
    sub = synthesize(spark, scale)
    for t in ("documents", "embeddings"):
        src, dst = os.path.join(sub, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        if not os.path.isdir(dst):
            shutil.copytree(src, dst)
    with open(marker, "w") as f:
        f.write("ok")
    return out


_SKEW_RECIPE_VERSION = 2  # 1 = events/orders hot key; 2 = +hot-bucket embeddings (r15)


def _unlink_stale_symlink(path: str) -> None:
    """A dst about to be rewritten must never be a symlink: Spark's
    overwrite delete recurses THROUGH the link into the shared base
    fixture (r15 ADVICE). Remove just the link, never the target."""
    if os.path.islink(path):
        os.unlink(path)


def synthesize_skewed(spark, scale: int) -> str:
    """HOT-KEY variant of the fixture (r6 VERDICT item 8): the replica
    model above is deliberately skew-free, so this mode remaps ~20% of
    events onto ONE user and ~20% of orders onto ONE custkey — the
    single-hot-reducer shape that wedges groupBy/window/stream state at
    scale. Unmodified tables are symlinked from the full fixture
    (``scale`` > 1) or the base sf0.1 dir; events/orders are rewritten
    with the remap. Row counts, timestamps, and referential integrity
    are untouched — only the key DISTRIBUTION changes, so a skewed-vs-
    skewed slope isolates scaling under skew from the skew penalty
    itself."""
    from pyspark.sql import functions as F

    out = os.path.join(SCRATCH, f"sf_skew_x{scale}")
    # VERSIONED completeness marker (r15 ADVICE): the r15 recipe change
    # (hot-bucket embeddings) made pre-r15 dirs silently WRONG two ways —
    # an old _COMPLETE early-returned with embeddings still symlinked to
    # the UNSKEWED base (probe measures benign data), and overwriting
    # through a stale symlink can delete the shared base fixture's files
    # (Hadoop fullyDelete recurses into the link target). Bump the
    # version whenever the synthesis recipe changes.
    marker = os.path.join(out, f"_COMPLETE_v{_SKEW_RECIPE_VERSION}")
    if os.path.isfile(marker):
        return out
    base = synthesize_full(spark, scale) if scale > 1 else BASE_SF
    os.makedirs(out, exist_ok=True)
    tables = (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    )
    for t_ in tables:
        dst = os.path.join(out, f"{t_}.parquet")
        if t_ in ("events", "orders", "embeddings") or os.path.exists(dst):
            continue
        os.symlink(os.path.join(base, f"{t_}.parquet"), dst)

    ev = spark.read.parquet(f"{base}/events.parquet")
    hot_user = ev.agg(F.min("user_id")).collect()[0][0]
    _unlink_stale_symlink(os.path.join(out, "events.parquet"))
    ev.withColumn(
        "user_id",
        F.when(F.pmod("event_id", F.lit(5)) == 0, F.lit(hot_user)).otherwise(
            F.col("user_id")
        ),
    ).repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    # r15 (VERDICT item 5): hot-BUCKET skew for the vector family — 20%
    # of embeddings become byte-identical copies of the min-vec_id
    # vector, so every sign-LSH band funnels them into ONE bucket (the
    # Σ|bucket|² worst case band widening can't fix). vec_id/label are
    # untouched: only the VALUE distribution changes.
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    hot_vec = (
        emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    )
    ev_dim = len(hot_vec)
    _unlink_stale_symlink(os.path.join(out, "embeddings.parquet"))
    emb.withColumn(
        "embedding",
        F.when(
            F.pmod("vec_id", F.lit(5)) == 0,
            F.array(*[F.lit(float(hot_vec[i])).cast("float") for i in range(ev_dim)]),
        ).otherwise(F.col("embedding")),
    ).repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    orders = spark.read.parquet(f"{base}/orders.parquet")
    hot_cust = orders.agg(F.min("o_custkey")).collect()[0][0]
    _unlink_stale_symlink(os.path.join(out, "orders.parquet"))
    orders.withColumn(
        "o_custkey",
        F.when(
            F.pmod("o_orderkey", F.lit(5)) == 0, F.lit(hot_cust)
        ).otherwise(F.col("o_custkey")),
    ).repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out


SKEW_QUERIES = [
    # one window/session key carrying 20% of all rows
    "sessionize_events",
    # stream-stream interval join where one user owns 20% of BOTH sides
    "stream_interval_join",
    # the explicit-salting query (its 90%-hot derived key is intrinsic)
    "join_skewed_salted",
    # exact median/MAD where one user owns 20% of all events — the r9
    # WEIGHTED-selection rework exists precisely for this shape (per-key
    # state = distinct values, not event count); an unweighted per-key
    # row sort would make the hot user a straggler task
    "events_anomaly_mad",
    # r14 (r13 VERDICT item 5): the ITERATIVE graph family under a
    # power-law hub. Both derive their edge relation from orders (src =
    # o_custkey), so the hot-key remap makes one customer a hub carrying
    # 20% of all FACT rows — the edge-derivation join + distinct absorb
    # the skew (post-distinct the hub's degree caps at catalog scale:
    # one row per distinct supplier), and each loop round then feeds the
    # hub's whole adjacency through the message aggregation. The
    # classic failure is a straggler reducer on the hub node in the
    # per-round groupBy; the pinned-adjacency discipline keeps messages
    # map-combined, which is exactly what the slope certifies.
    "graph_sssp",
    "graph_label_communities",
    # r15 (r14 VERDICT item 5): the vector family under a 20%-hot LSH
    # bucket (byte-identical embeddings). Both run their CAPPED twins —
    # the hot-bucket budget guard (sign_band_relation bucket_cap) is the
    # deployment default for exactly this shape; the uncapped originals
    # keep the definition-exact audit posture (quadratic-by-construction
    # under mass duplication, like dedup_simhash_adaptive).
    "dedup_embedding_lsh_capped",
    "sim_graph_topk_capped",
    # r16 (r15 VERDICT item 1): the composed deployment default —
    # adaptive log2(n) band width AND the hot-bucket coin cap. The
    # capped fixed-width twin above keeps its 8-bit bands, so its
    # residual slope isolates uniform-density growth; this one should
    # gate materially lower (target <= 3x).
    "dedup_embedding_lsh_adaptive_capped",
]

# Under the hot key, a CORRECT interval join's OUTPUT is the hot pair
# count — which the skew fixture grows with the data by construction, so
# raw wall ratio would punish correctness. These gate on
# time-per-output-row (work_slope = slope / output_ratio), the same
# honest metric the bench PAIR_EMITTERS use. Since r8 the registered
# stream_interval_join is itself horizon-paced (half-month event-time
# chunk files drained at maxFilesPerTrigger=1 — state per key bounded by
# the watermark horizon, never the corpus), so the probe measures the
# registered artifact directly; the r6–r7 probe needed an unregistered
# paced override here, which measured 7.51× wall at 10× skewed data.
SKEW_PAIR_EMITTERS = {"stream_interval_join"}


def assert_skew_mitigation(spark, skew_dir: str) -> dict:
    """Plan assertions AT THE PROBE SCALE: (a) the salted join's plan
    still carries the `_salt` shard column; (b) AQE's skew-join split
    actually ENGAGES on the hot-custkey orders⨝customer sort-merge join.
    AQE's default trip-wires (256 MB skewed-partition threshold) are
    sized for cluster-scale partitions — the probe fixture's hot shuffle
    partition is sub-MB compressed — so the probe scales them to the
    fixture (128 KB threshold / 1.5× median / 64 KB advisory). The
    assertion is that the MECHANISM fires on this key distribution,
    exactly as the defaults would at 100 TB partition sizes."""
    from etl_drone_sense_spark.plans.registry import get

    plan = get("join_skewed_salted").fn(spark, skew_dir)._jdf.queryExecution()
    salted_ok = "_salt" in plan.optimizedPlan().toString()

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{skew_dir}/orders.parquet")
        cust = spark.read.parquet(f"{skew_dir}/customer.parquet")
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
        # execute and inspect the SAME QueryExecution: a .write action
        # plans its own copy and a post-hoc .explain() RE-plans without
        # runtime stats, so neither ever shows skew=true — the count
        # rides on top of the join inside one adaptive plan, whose
        # executedPlan string carries SortMergeJoin(skew=true) +
        # "AQEShuffleRead coalesced and skewed" once finalized
        probe_df = joined.groupBy().count()
        probe_df.collect()
        s = probe_df._jdf.queryExecution().executedPlan().toString()
        aqe_ok = "skew=true" in s
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return {"salted_plan_has_salt": salted_ok, "aqe_skew_split_engaged": aqe_ok}


def median_time(run, n=3) -> float:
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--keep", action="store_true", help="keep scratch data")
    ap.add_argument(
        "--full",
        action="store_true",
        help="synthesize ALL tables and slope-probe the complete bench set "
        "(r5 VERDICT item 1); writes BENCH_sf1.json in full mode",
    )
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated bench-query names: probe ONLY these against "
        "the full fixture and MERGE their rows into the existing "
        "BENCH_sf1.json (other queries keep their recorded slopes) — the "
        "per-round re-certification path for new/changed queries; implies "
        "--full fixtures",
    )
    ap.add_argument(
        "--skewed",
        action="store_true",
        help="hot-key probe (r6 VERDICT item 8): remap ~20%% of events to "
        "one user / orders to one custkey at 1x and at --scale, slope the "
        "skew-sensitive queries, and assert salting + AQE skew split "
        "engage; writes SKEW_PROBE.json",
    )
    args = ap.parse_args()

    from etl_drone_sense_spark.caching import release_caches
    from etl_drone_sense_spark.plans.registry import all_queries
    from etl_drone_sense_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    results: dict[str, dict] = {}

    def run_one(fn, d):
        fn(spark, d).write.mode("overwrite").format("noop").save()
        release_caches()

    if args.skewed:
        base_skew = synthesize_skewed(spark, 1)
        scaled_skew = synthesize_skewed(spark, args.scale)

        for name in SKEW_QUERIES:
            fn = queries[name]
            # The warm runs double as output-cardinality probes: under a
            # hot key a CORRECT interval join's OUTPUT is the hot pair
            # count, which grows with the data by construction — so the
            # skew pair-emitters gate on time-per-output-row (work_slope,
            # same honest metric as the bench PAIR_EMITTERS), everything
            # else on the raw wall ratio. Since r8 the REGISTERED
            # stream_interval_join is itself horizon-paced (half-month
            # chunk files × maxFilesPerTrigger=1), so the probe drives it
            # directly — no unregistered override.
            base_rows = fn(spark, base_skew).count()
            release_caches()
            base_s = median_time(lambda: run_one(fn, base_skew))
            scaled_rows = fn(spark, scaled_skew).count()
            release_caches()
            scaled_s = median_time(lambda: run_one(fn, scaled_skew))
            entry = {
                "base_s": round(base_s, 3),
                "scaled_s": round(scaled_s, 3),
                "slope": round(scaled_s / base_s, 2),
            }
            if name in SKEW_PAIR_EMITTERS:
                entry["base_rows"] = base_rows
                entry["scaled_rows"] = scaled_rows
                entry["work_slope"] = round(
                    entry["slope"] / (scaled_rows / max(base_rows, 1)), 2
                )
            results[name] = entry
            print(
                f"{name}: {base_s:.2f}s -> {scaled_s:.2f}s at {args.scale}x "
                f"skewed (slope {entry['slope']:.1f}x"
                + (
                    f", work_slope {entry['work_slope']:.2f}x over "
                    f"{base_rows}->{scaled_rows} rows"
                    if name in SKEW_PAIR_EMITTERS
                    else ""
                )
                + ")",
                file=sys.stderr,
            )
        assertions = assert_skew_mitigation(spark, scaled_skew)
        max_slope = max(
            r.get("work_slope", r["slope"]) for r in results.values()
        )
        report = {
            "sf_base": 0.1,
            "scale": args.scale,
            "mode": "skewed",
            "hot_key_share": 0.2,
            "queries": results,
            "max_slope": max_slope,
            "limit": float(args.scale),
            "plan_assertions": assertions,
        }
        with open(os.path.join(REPO, "SKEW_PROBE.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report))
        if not args.keep:
            shutil.rmtree(SCRATCH, ignore_errors=True)
        ok = max_slope <= args.scale and all(assertions.values())
        if not ok:
            print(
                f"SKEW PROBE FAILED: max slope {max_slope} "
                f"(limit {args.scale}) assertions {assertions}",
                file=sys.stderr,
            )
        return 0 if ok else 1

    scaled_dir = synthesize(spark, args.scale)

    # dedup_embedding_lsh's band width must follow log2(n) to hold bucket
    # occupancy constant (Σ|bucket|² = n²/2^width per band): the registered
    # query pins the fixture-scale config (8 bands × 8 bits) for oracle
    # determinism, so at 10× corpus the probe drives the SAME operator at
    # the config a 10× deployment would use — 12-bit bands (+log2(10)≈3.3,
    # rounded up). Without this the candidate space is quadratic BY
    # CONFIG, not by plan (measured 17× slope at fixed 8-bit bands).
    def lsh_scaled(spark_, d):
        from etl_drone_sense_spark.functions import vectors as V
        from etl_drone_sense_spark.operators import similarity
        from etl_drone_sense_spark.plans.extensions import _seeded_embeddings

        return similarity.hyperplane_lsh_pairs(
            _seeded_embeddings(spark_, d),
            planes=V.hyperplanes(dim=64, nbits=96),
            bands=8,
            threshold=0.8,
        )

    scaled_fn_override = {"dedup_embedding_lsh": lsh_scaled}

    if args.only:
        from etl_drone_sense_spark.plans.registry import bench_queries

        probe_names = sorted(args.only.split(","))
        unknown = set(probe_names) - set(bench_queries())
        if unknown:
            print(f"not bench queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        scaled_dir = synthesize_full(spark, args.scale)
    elif args.full:
        from etl_drone_sense_spark.plans.registry import bench_queries

        probe_names = sorted(bench_queries())
        scaled_dir = synthesize_full(spark, args.scale)
    else:
        probe_names = PROBE_QUERIES

    for name in probe_names:
        fn = queries[name]
        scaled_fn = scaled_fn_override.get(name, fn)
        run_one(fn, BASE_SF)  # warm codegen/broadcast paths
        base_s = median_time(lambda: run_one(fn, BASE_SF))
        # The scaled variant may carry a DIFFERENT codegen signature (e.g.
        # the 96-bit LSH override), so it needs its own warm run — without
        # it the first timed sample pays Janino compilation (~8 s) and a
        # median-of-3 can't fully mask it, inflating the slope ~2×.
        run_one(scaled_fn, scaled_dir)
        scaled_s = median_time(lambda: run_one(scaled_fn, scaled_dir))
        slope = scaled_s / base_s
        results[name] = {
            "base_s": round(base_s, 3),
            "scaled_s": round(scaled_s, 3),
            "slope": round(slope, 2),
        }
        if name in PAIR_EMITTERS:
            rows_base = fn(spark, BASE_SF).count()
            rows_scaled = scaled_fn(spark, scaled_dir).count()
            ratio = max(rows_scaled, 1) / max(rows_base, 1)
            results[name].update(
                {
                    "rows_base": rows_base,
                    "rows_scaled": rows_scaled,
                    "output_ratio": round(ratio, 2),
                    # the dup-deepened fixture grows these queries'
                    # OUTPUT quadratically by construction; the gate
                    # metric is time-per-output-row
                    "work_slope": round(slope / max(ratio, 1.0), 2),
                }
            )
        print(
            f"{name}: {base_s:.2f}s -> {scaled_s:.2f}s at {args.scale}x"
            f" (slope {slope:.1f}x"
            + (
                f", output x{results[name]['output_ratio']}, "
                f"work slope {results[name]['work_slope']}x"
                if name in PAIR_EMITTERS
                else ""
            )
            + ")",
            file=sys.stderr,
        )

    def effective_slope(r: dict) -> float:
        return r.get("work_slope", r["slope"])

    if args.only:
        # merge into the recorded full-mode report: re-measured rows
        # replace their old entries, everything else keeps its evidence
        with open(os.path.join(REPO, "BENCH_sf1.json")) as f:
            prior = json.load(f)
        merged = dict(prior.get("queries", {}))
        merged.update(results)
        results = merged

    max_slope = max(effective_slope(r) for r in results.values())
    report = {
        "sf_base": 0.1,
        "scale": args.scale,
        "mode": "full" if (args.full or args.only) else "top-cost",
        "queries": results,
        "max_slope": max_slope,
        "slope_metric": "work_slope (time per output row) for declared "
        "pair emitters whose output the dup-deepened fixture grows "
        "quadratically by construction; raw wall slope otherwise",
        # full mode holds every query to LINEAR (slope <= scale: 10x data
        # may take at most 10x time); the top-cost probe keeps its original
        # headroom for parallelism warm-up effects on the heaviest plans.
        "limit": args.scale
        * (1.0 if (args.full or args.only) else MAX_SLOPE_FACTOR),
    }
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))

    if not args.keep:
        shutil.rmtree(SCRATCH, ignore_errors=True)
    if max_slope > report["limit"]:
        print(
            f"SUPERLINEAR: max slope {max_slope} > {report['limit']}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
