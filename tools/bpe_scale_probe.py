"""Vocab-scale BPE trainer measurement (r16 — r15 VERDICT item 7):
certify that train_merges_batched's merges/|batch| amortization HOLDS as
the frontier concentrates, at >= 1k merges on a 10x-vocab corpus.

The fixture text is template-generated (40 distinct words corpus-wide),
so its entire merge space drains in 89 merges — far below the 32k-vocab
regime the batched trainer exists for. This probe derives a vocab-scale
corpus from the sf1 documents the same way the scale fixtures derive
their replicas (a deterministic doc_id-keyed suffix token): each doc
gains one ``tokN`` word, so the distinct-word vocab grows to ~|docs|
(~250k at the 10x fixture) and the reachable merge space is thousands —
digit/char pair structure shared across the suffix family, which is
exactly the concentrated-frontier shape that degenerated the dominance
variant.

Prints one JSON line:
  {"corpus": .., "distinct_words": .., "batch_k": .., "rounds_run": ..,
   "merges": .., "total_s": .., "s_per_merge": ..,
   "collects_per_merge": .., "admitted_per_round": [..],
   "quartile_s_per_merge": [q1, q2, q3, q4]}

Run:  python tools/bpe_scale_probe.py [--dir .scale_probe/sf1_full_x10]
          [--batch-k 64] [--rounds 40] [--target-merges 1000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dir", default=os.path.join(REPO, ".scale_probe", "sf1_full_x10")
    )
    ap.add_argument("--batch-k", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--target-merges", type=int, default=1000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_drone_sense_spark.operators.bpetrain import train_merges_batched
    from etl_drone_sense_spark.session import get_spark

    spark = get_spark(app_name="bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{args.dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # The vocab-scale derivation: one deterministic suffix word per doc.
    rich = docs.select(
        F.concat(
            F.col("text"), F.lit(" tok"), F.col("doc_id").cast("string")
        ).alias("text")
    )
    n_docs = rich.count()

    stats: list[dict] = []
    t0 = time.perf_counter()
    learned = train_merges_batched(
        rich,
        batch_rounds=args.rounds,
        batch_k=args.batch_k,
        stats_out=stats,
    )
    total_s = time.perf_counter() - t0

    merges = len(learned)
    admitted = [s["admitted"] for s in stats]
    # Quartile s/merge over the ROUND sequence: does the late (most
    # concentrated) quarter still amortize, or has admitted/round
    # collapsed toward 1 (the degenerate regime)?
    quartiles: list[float] = []
    nq = max(1, len(stats) // 4)
    for qi in range(0, len(stats), nq):
        chunk = stats[qi : qi + nq]
        m = sum(c["admitted"] for c in chunk)
        w = sum(c["wall_s"] for c in chunk)
        quartiles.append(round(w / max(m, 1), 4))
    out = {
        "corpus": args.dir,
        "docs": n_docs,
        "batch_k": args.batch_k,
        "rounds_run": len(stats),
        "merges": merges,
        "target_merges": args.target_merges,
        "total_s": round(total_s, 1),
        "s_per_merge": round(total_s / max(merges, 1), 4),
        "collects_per_merge": round(len(stats) / max(merges, 1), 4),
        "admitted_per_round": admitted,
        "quartile_s_per_merge": quartiles,
        "met_target": merges >= args.target_merges,
    }
    print(json.dumps(out))
    return 0 if merges >= args.target_merges else 1


if __name__ == "__main__":
    sys.exit(main())
