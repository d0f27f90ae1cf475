"""Differential comparison: Spark DataFrame vs DuckDB oracle result.

Mirrors the driver's gate (row count + schema names + order-insensitive
value match). Exact by default — float aggregates must be made deterministic
in the query itself (decimal routing), not papered over with tolerances.
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return None
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return ts.floor("us").isoformat()
    if isinstance(v, datetime.datetime):
        if v.tzinfo:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.replace(microsecond=v.microsecond).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, str):
        return v
    if pd.isna(v):
        return None
    return v


def canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(canon_value(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort(key=repr)
    return rows


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str = ""):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"[{key}] column mismatch: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"[{key}] row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canon_frame(spark_pdf)
    d_rows = canon_frame(duck_pdf)
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        # repr-strict, not ==: a value-hashing driver distinguishes int 42
        # from double 42.0 and 0.0 from -0.0, so the differential must too
        # (caught real oracle-type gaps: HUGEINT sums, round(-eps) signs).
        assert repr(a) == repr(b), (
            f"[{key}] first differing row (sorted order) at {i}:\n"
            f"  spark: {a}\n  duck:  {b}"
        )
