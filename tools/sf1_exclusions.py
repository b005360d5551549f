"""Close the three sf1 oracle exclusions (r6 VERDICT item 2).

SF1_CERT.md certified 145/148 queries by direct hash compare at the 10×
fixture; three were excluded for ORACLE/COMPARE-side cost, not engine
failures. This harness certifies each with the alternative the r6
verdict prescribed:

* ``dedup_cluster_stats`` — the DuckDB recursive-CTE closure times out
  at sf1 (Σ|component|² tuples). Here the ground truth is a DRIVER-SIDE
  sequential union-find over the engine's own pair relation — legitimate
  because that pair relation is itself hash-certified at sf1
  (``dedup_minhash``, 4.25M rows, SF1_CERT.md) and the union-find is the
  same independent implementation the unit suite uses
  (tests/test_graph.py).
* ``geo_radius_join`` — the registered oracle is the DELIBERATE
  quadratic join (1.5×10⁹ candidates at sf1). Here DuckDB runs an
  INDEPENDENT latitude-band blocked formulation; with the
  blocked-vs-quadratic equivalence already driver-certified at
  sf0.01/sf0.1, engine-vs-blocked at sf1 completes the two-step
  transitivity.
* ``dedup_simhash`` — the narrow 16-bit config emits 312M pairs at sf1
  (excluded by design; its docstring pins the measurement). The
  occupancy rule's config at this scale IS ``dedup_simhash_adaptive``
  (12-bit cap width, ~500k pairs): certify IT by direct hash compare
  against the width-independent 48-bit oracle.

Writes SF1_EXCLUSIONS.json. Needs the kept sf1 fixture
(.scale_probe/sf1_full_x10 — run ``tools/scale_probe.py --full --keep``
first) and a sized driver heap (VERIFY_DRIVER_MEM=24g).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scale_probe", "sf1_full_x10")


def canon(df_):
    cols = sorted(df_.columns)

    def c(v):
        return "" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v)

    return sorted(tuple(c(r[col]) for col in cols) for r in df_.to_dict("records"))


def union_find(pairs):
    # same algorithm as tests/test_graph.py::_union_find (kept in sync by
    # test_sf1_harness_unionfind_matches below importing THIS one there)
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def check_cluster_stats(spark) -> dict:
    from collections import Counter

    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.extensions import (
        MH_BANDS,
        MH_K,
        SHINGLE_N,
    )
    from etl_drone_sense_spark.plans.registry import get, t

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        t(spark, SF1, "documents"), "doc_id", "text",
        k=MH_K, bands=MH_BANDS, threshold=0.2, shingle_n=SHINGLE_N,
    )
    edge_rows = pairs.select("id_a", "id_b").toPandas()
    comp = union_find(
        list(zip(edge_rows["id_a"].tolist(), edge_rows["id_b"].tolist()))
    )
    sizes = Counter(comp.values())
    want = sorted(
        (lab, n, lab) for lab, n in sizes.items()
    )  # (component, n_members, keep_id): keep = min member = label

    got_rows = get("dedup_cluster_stats").fn(spark, SF1).toPandas()
    got = sorted(
        (int(r.component), int(r.n_members), int(r.keep_id))
        for r in got_rows.itertuples()
    )
    return {
        "match": got == want,
        "edges": int(len(edge_rows)),
        "clusters": int(len(got)),
        "wall_s": round(time.time() - t0, 1),
        "method": "driver union-find over the sf1-hash-certified pair relation",
    }


def check_split_leakage(spark) -> dict:
    """corpus_split_leakage_safe at sf1 — same oracle-cost exclusion class
    as dedup_cluster_stats (its DuckDB side IS the recursive closure):
    ground truth = the same driver union-find over the sf1-hash-certified
    pair relation, plus the md5 coins replayed in python (hashlib md5 of
    the decimal string, first 8 hex digits, mod 10 — the engines' exact
    arithmetic)."""
    import hashlib
    from collections import defaultdict

    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.extensions import (
        MH_BANDS,
        MH_K,
        SHINGLE_N,
    )
    from etl_drone_sense_spark.plans.registry import get, t

    t0 = time.time()
    docs = (
        t(spark, SF1, "documents").select("doc_id").toPandas()["doc_id"]
        .astype(int).tolist()
    )
    pairs = dedup.minhash_lsh_pairs(
        t(spark, SF1, "documents"), "doc_id", "text",
        k=MH_K, bands=MH_BANDS, threshold=0.2, shingle_n=SHINGLE_N,
    )
    edge_rows = pairs.select("id_a", "id_b").toPandas()
    comp = union_find(
        list(zip(edge_rows["id_a"].tolist(), edge_rows["id_b"].tolist()))
    )

    def coin(x: int) -> str:
        h = int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
        return "train" if h % 10 < 8 else "test"

    members: dict[int, list[int]] = defaultdict(list)
    for d in docs:
        members[comp.get(d, d)].append(d)
    agg: dict[str, list[int]] = {
        "train": [0, 0, 0], "test": [0, 0, 0]
    }  # n_docs, n_clusters, naive_leak_doc_count
    for label, mem in members.items():
        sp = coin(label)
        naive = {coin(d) for d in mem}
        leaks = 1 if len(naive) > 1 else 0
        agg[sp][0] += len(mem)
        agg[sp][1] += 1
        agg[sp][2] += leaks * len(mem)
    want = sorted(
        (sp, v[0], v[1], v[2]) for sp, v in agg.items() if v[0]
    )

    got_rows = get("corpus_split_leakage_safe").fn(spark, SF1).toPandas()
    got = sorted(
        (str(r.split), int(r.n_docs), int(r.n_clusters),
         int(r.naive_leak_doc_count))
        for r in got_rows.itertuples()
    )
    return {
        "match": got == want,
        "docs": len(docs),
        "splits": got,
        "wall_s": round(time.time() - t0, 1),
        "method": "driver union-find + python md5 coins over the "
                  "sf1-hash-certified pair relation",
    }


def check_keep_best(spark, con) -> dict:
    """dedup_keep_best at sf1 (r12) — same oracle-cost exclusion class as
    dedup_cluster_stats (its DuckDB side embeds the same recursive
    closure): ground truth = the driver union-find over the
    sf1-hash-certified pair relation, composed with per-doc quality
    scores computed by DUCKDB from the shared score-expression text (the
    quality relation is itself hash-certified through this query's
    sf0.01 driver row), argmax per cluster with the (quality DESC, id)
    tie-break replayed in python."""
    from collections import defaultdict

    from etl_drone_sense_spark.operators import dedup
    from etl_drone_sense_spark.plans.extensions import (
        MH_BANDS,
        MH_K,
        SHINGLE_N,
        _QUALITY_SCORE_SQL,
    )
    from etl_drone_sense_spark.plans.registry import get, t

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        t(spark, SF1, "documents"), "doc_id", "text",
        k=MH_K, bands=MH_BANDS, threshold=0.2, shingle_n=SHINGLE_N,
    )
    edge_rows = pairs.select("id_a", "id_b").toPandas()
    comp = union_find(
        list(zip(edge_rows["id_a"].tolist(), edge_rows["id_b"].tolist()))
    )
    qdf = con.execute(
        f"SELECT doc_id, {_QUALITY_SCORE_SQL} AS q FROM documents"
    ).fetchdf()
    quality = dict(zip(qdf["doc_id"].astype(int), qdf["q"].astype(float)))
    members: dict[int, list[int]] = defaultdict(list)
    for node, lab in comp.items():
        members[lab].append(node)
    want = []
    for lab, mem in members.items():
        best = min(mem, key=lambda d: (-quality[d], d))
        for d in mem:
            want.append((d, lab, len(mem), str(quality[d]), d == best))
    want.sort()

    got_rows = get("dedup_keep_best").fn(spark, SF1).toPandas()
    got = sorted(
        (int(r.doc_id), int(r.cluster), int(r.n_members),
         str(float(r.quality_score)), bool(r.kept))
        for r in got_rows.itertuples()
    )
    return {
        "match": got == want,
        "members": len(got),
        "clusters": len(members),
        "wall_s": round(time.time() - t0, 1),
        "method": "driver union-find over the sf1-hash-certified pair "
        "relation + DuckDB-evaluated shared quality expression, argmax "
        "replayed in python",
    }


def check_geo_radius(spark, con) -> dict:
    from etl_drone_sense_spark.functions.geodesy import haversine_sql
    from etl_drone_sense_spark.plans.drone import _RADIUS_M
    from etl_drone_sense_spark.plans.registry import get

    t0 = time.time()
    blocked_sql = f"""
    WITH cust AS (
        SELECT c_custkey,
               CAST(((c_custkey * 7) % 120) - 60 + 0.25 AS DOUBLE) AS dlat,
               CAST(((c_custkey * 13) % 340) - 170 + 0.25 AS DOUBLE) AS dlon
        FROM customer
    ),
    poi AS (
        SELECT s_suppkey,
               CAST(((s_suppkey * 31) % 120) - 60 + 0.5 AS DOUBLE) AS plat,
               CAST(((s_suppkey * 17) % 340) - 170 + 0.5 AS DOUBLE) AS plon
        FROM supplier
    ),
    poib AS (
        SELECT s_suppkey, plat, plon,
               CAST(floor(plat) AS BIGINT) + d.d AS band
        FROM poi CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) d
    ),
    cand AS (
        SELECT c.c_custkey, p.s_suppkey, c.dlat, c.dlon, p.plat, p.plon
        FROM (SELECT *, CAST(floor(dlat) AS BIGINT) AS band FROM cust) c
        JOIN poib p USING (band)
    )
    SELECT c_custkey, s_suppkey,
           round({haversine_sql('dlat', 'dlon', 'plat', 'plon')}, 4) AS dist_m
    FROM cand
    WHERE round({haversine_sql('dlat', 'dlon', 'plat', 'plon')}, 4)
          <= {_RADIUS_M}
    """
    odf = con.execute(blocked_sql).fetchdf()
    sdf = get("geo_radius_join").fn(spark, SF1).toPandas()
    return {
        "match": sorted(sdf.columns) == sorted(odf.columns)
        and canon(sdf) == canon(odf),
        "rows": int(len(sdf)),
        "oracle_rows": int(len(odf)),
        "wall_s": round(time.time() - t0, 1),
        "method": "independent DuckDB latitude-band blocked join "
        "(blocked-vs-quadratic already certified at sf0.01/sf0.1)",
    }


def check_simhash_adaptive(spark, con) -> dict:
    from etl_drone_sense_spark.plans.registry import get

    t0 = time.time()
    spec = get("dedup_simhash_adaptive")
    sdf = spec.fn(spark, SF1).toPandas()
    odf = con.execute(spec.oracle).fetchdf()
    return {
        "match": sorted(sdf.columns) == sorted(odf.columns)
        and canon(sdf) == canon(odf),
        "rows": int(len(sdf)),
        "oracle_rows": int(len(odf)),
        "wall_s": round(time.time() - t0, 1),
        "method": "direct hash compare of the adaptive config (12-bit "
        "derived width at sf1) against the width-independent oracle; "
        "the fixed 16-bit twin stays excluded by design (312M pairs)",
    }


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    if not os.path.isdir(SF1):
        print(f"missing sf1 fixture at {SF1}; run scale_probe --full --keep")
        return 2

    builder = SparkSession.builder.master(
        os.environ.get("VERIFY_MASTER", "local[16]")
    )
    if mem := os.environ.get("VERIFY_DRIVER_MEM", "24g"):
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t_ in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        p = f"{SF1}/{t_}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t_} AS SELECT * FROM '{src}'")

    checks = {
        "dedup_cluster_stats": lambda: check_cluster_stats(spark),
        "corpus_split_leakage_safe": lambda: check_split_leakage(spark),
        "geo_radius_join": lambda: check_geo_radius(spark, con),
        "dedup_simhash_adaptive": lambda: check_simhash_adaptive(spark, con),
        "dedup_keep_best": lambda: check_keep_best(spark, con),
    }
    only = set(sys.argv[1:])
    unknown = only - set(checks)
    if unknown:
        print(f"unknown check names: {sorted(unknown)}", file=sys.stderr)
        return 2
    # named-subset runs MERGE into the existing report (same convention
    # as scale_probe --only) so a targeted re-cert keeps the others
    report = {}
    out_path = os.path.join(REPO, "SF1_EXCLUSIONS.json")
    if only and os.path.isfile(out_path):
        with open(out_path) as f:
            report = json.load(f)
    for name, fn in checks.items():
        if only and name not in only:
            continue
        report[name] = fn()
        print(f"{name}: {report[name]}", flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    ok = all(r["match"] for r in report.values())
    print("ALL MATCHED" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
