"""Differential gate rehearsal: every registry query runs on Spark AND its
DuckDB oracle at sf0.001; results must match (order-insensitive). This is
the same shape as the driver's CORRECTNESS check at sf0.01."""

from __future__ import annotations

import pytest

from etl_drone_sense_spark.plans import REGISTRY, all_queries

from .compare import assert_frames_match

all_queries()  # populate REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke, mirroring the driver
        return
    odf = duck.execute(spec.oracle).fetchdf()
    assert_frames_match(sdf, odf, name)
