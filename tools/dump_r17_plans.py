"""Dump .explain("formatted") for named queries into plans/r17/.

Usage: python tools/dump_r17_plans.py <suffix> <query> [<query> ...]
e.g.   python tools/dump_r17_plans.py before multimodal_decode_adpcm
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from etl_drone_sense_spark.plans.registry import REGISTRY, all_queries
    from etl_drone_sense_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    all_queries()
    spark = get_spark("plan-dump-r17", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.001"
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r17",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
