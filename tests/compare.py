"""Differential comparison helpers mirroring the driver's oracle gate:
row-count + column names + order-insensitive value comparison."""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd

REL_TOL = 1e-9
ABS_TOL = 1e-9


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(canon_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return v.item()
    except ImportError:  # pragma: no cover
        pass
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols) for _, row in df[cols].iterrows()
    ]

    def key(row):
        return tuple(
            (x is None, str(type(x)), str(x)) for x in row
        )

    return sorted(rows, key=key)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    if isinstance(a, bool) or isinstance(b, bool):
        return a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        # int-vs-float is a dtype mismatch the driver's schema/hash compare
        # would flag — treat as unequal even when numerically identical.
        if isinstance(a, float) != isinstance(b, float):
            return False
        return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
    return a == b


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a_rows = canon_rows(spark_df)
    b_rows = canon_rows(oracle_df)
    mismatches = []
    for i, (ra, rb) in enumerate(zip(a_rows, b_rows)):
        if not all(cells_equal(x, y) for x, y in zip(ra, rb)):
            mismatches.append((i, ra, rb))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (first 5): {mismatches}"
