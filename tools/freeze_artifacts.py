"""Regenerate the frozen similarity artifacts from the CURRENT fixtures.

The driver can regenerate /root/testdata between rounds (it did for round
4: new RNG stream, events ts re-encoded µs). The frozen IVF codebook
(plans/_frozen_codebook.py) and PQ codebooks (plans/_frozen_pq.py) are
trained offline on the sf0.01 embeddings fixture and shipped as literals
to BOTH the engine and the DuckDB oracle — parity survives a fixture swap
(same literals on both sides), but retrieval QUALITY collapses when the
codebooks no longer describe the data (tests/test_similarity_quality.py
catches that). Run this after any fixture regeneration:

    python tools/freeze_artifacts.py [sf_dir]

Training recipes (unchanged across rounds — this file just makes them
runnable instead of living in docstrings):
* IVF: operators/similarity.kmeans_train(emb, k=8, iters=3) — seeds are
  the 8 lowest-vec_id vectors, Lloyd's on Spark.
* PQ:  8 subspaces x 8 dims x 8 centroids, deterministic numpy Lloyd,
  5 iterations, seeds = each subspace's 8 lowest-vec_id subvectors,
  L2 assignment with lowest-index tie-break, empty cells keep their
  previous centroid.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PQ_M = 8
PQ_DSUB = 8
PQ_KSUB = 8
IVF_K = 8
IVF_K_SEMDEDUP = 64  # SemDeDup wants |cell| ~ constant -> k ~ sqrt(n)
IVF_ITERS = 3


def train_pq(X: np.ndarray) -> list[tuple[int, int, list[float]]]:
    """Deterministic numpy Lloyd per subspace (rows of X sorted by vec_id)."""
    rows = []
    for j in range(PQ_M):
        sub = X[:, j * PQ_DSUB : (j + 1) * PQ_DSUB].astype(np.float64)
        cents = sub[:PQ_KSUB].copy()  # seeds: 8 lowest-vec_id subvectors
        for _ in range(5):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin takes the lowest index on ties
            for c in range(PQ_KSUB):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        rows.extend(
            (j + 1, c + 1, [float(v) for v in cents[c]]) for c in range(PQ_KSUB)
        )
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from etl_drone_sense_spark.operators.similarity import kmeans_train
    from etl_drone_sense_spark.session import get_spark
    from etl_drone_sense_spark.sources.readers import read_table

    spark = get_spark(app_name="freeze-artifacts", master="local[8]")
    emb = read_table(spark, sf_dir, "embeddings")

    ivf = sorted(
        (r["cell_id"], [float(v) for v in r["embedding"]])
        for r in kmeans_train(emb, k=IVF_K, iters=IVF_ITERS).collect()
    )
    ivf64 = sorted(
        (r["cell_id"], [float(v) for v in r["embedding"]])
        for r in kmeans_train(emb, k=IVF_K_SEMDEDUP, iters=IVF_ITERS).collect()
    )

    rows = emb.orderBy("vec_id").select("embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    pq = train_pq(X)

    cb = os.path.join(REPO, "etl_drone_sense_spark", "plans", "_frozen_codebook.py")
    with open(cb, "w", encoding="utf-8") as f:
        f.write(
            '"""Frozen IVF codebook: 8x64 k-means centroids trained ONCE (offline,\n'
            "deterministically) by operators/similarity.kmeans_train on the sf0.01\n"
            "embeddings fixture (k=8, iters=3), then frozen as literals -- the\n"
            "production IVF shape, where the codebook is trained offline and shipped\n"
            "to both the engine and any verifier. repr() rendering round-trips\n"
            "float64 exactly in Python, Spark literals, and DuckDB CAST-from-text.\n"
            "\n"
            "Regenerate (whenever the fixture or trainer changes):\n"
            "    python tools/freeze_artifacts.py\n"
            '"""\n\n'
            "FROZEN_CENTROIDS: list[tuple[int, list[float]]] = [\n"
        )
        for cell_id, vec in ivf:
            f.write(f"    ({cell_id}, {vec!r}),\n")
        f.write("]\n")
        f.write(
            "\n# k=64 codebook for SemDeDup (k ~ sqrt(n): bounded cells keep\n"
            "# the within-cell pair space linear in n). Same trainer, k=64.\n"
            "FROZEN_CENTROIDS_64: list[tuple[int, list[float]]] = [\n"
        )
        for cell_id, vec in ivf64:
            f.write(f"    ({cell_id}, {vec!r}),\n")
        f.write("]\n")

    pqf = os.path.join(REPO, "etl_drone_sense_spark", "plans", "_frozen_pq.py")
    with open(pqf, "w", encoding="utf-8") as f:
        f.write(
            '"""Frozen product-quantization codebooks: 8 subspaces x 8 dims x 8\n'
            "centroids, trained ONCE offline (deterministic numpy Lloyd, 5 iters,\n"
            "seeds = the 8 lowest-vec_id subvectors) on the sf0.01 embeddings\n"
            "fixture. repr() floats round-trip exactly into Spark literals and\n"
            "DuckDB CAST-from-text.\n"
            "\n"
            "Regenerate (whenever the fixture or trainer changes):\n"
            "    python tools/freeze_artifacts.py\n"
            '"""\n\n'
            f"PQ_M = {PQ_M}      # subspaces\n"
            f"PQ_DSUB = {PQ_DSUB}   # dims per subspace\n"
            f"PQ_KSUB = {PQ_KSUB}   # centroids per subspace\n\n"
            "# (subspace j, centroid c, 8-dim centroid vector); j and c are 1-based.\n"
            "FROZEN_PQ: list[tuple[int, int, list[float]]] = [\n"
        )
        for j, c, vec in pq:
            f.write(f"    ({j}, {c}, {vec!r}),\n")
        f.write("]\n")

    from etl_drone_sense_spark.sources.readers import fixture_fingerprint

    meta = os.path.join(REPO, "etl_drone_sense_spark", "plans", "_frozen_meta.py")
    fp = fixture_fingerprint(f"{sf_dir}/embeddings.parquet")
    with open(meta, "w", encoding="utf-8") as f:
        f.write(
            '"""Which fixture generation the frozen artifacts were trained on.\n'
            "\n"
            "Distribution-dependent quality tests compare this against the\n"
            "CURRENT embeddings footer and SKIP with a retrain instruction when\n"
            "the driver has regenerated /root/testdata (oracle parity is\n"
            "unaffected — both engines share the stale literals — but recall\n"
            "collapses on data the codebooks never saw). Regenerated by\n"
            "tools/freeze_artifacts.py; never edit by hand.\n"
            '"""\n\n'
            f"TRAINED_ON_SF_DIR = {sf_dir!r}\n"
            f"TRAINED_ON_FINGERPRINT = {fp!r}\n"
        )

    print(f"wrote {cb}\nwrote {pqf}\nwrote {meta}")


if __name__ == "__main__":
    main()
