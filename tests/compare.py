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


def _canon_nested(v):
    """Element canonizer inside arrays/structs — see the nested-NA note in
    canon_value."""
    if v is None:
        return "NA"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NA"
        if math.isfinite(f) and f == int(f):
            return int(f)
        return f
    return canon_value(v)


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            # sign-of-zero is not comparable across engines: Spark's hash
            # aggregation normalizes -0.0 group keys to +0.0 (SPARK-32110)
            # while DuckDB reports the stored sign — numerically equal,
            # repr-distinct; canonize to +0.0
            return 0.0
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
    if isinstance(v, np.ndarray) and v.ndim == 0:
        # DuckDB's fetchdf renders some NULL nested cells as 0-d object
        # arrays; unwrap to the scalar (usually None) before canonizing
        return canon_value(v.item())
    if isinstance(v, (list, tuple, np.ndarray)):
        # Nested NULL vs NaN is UNRECOVERABLE through the pandas bridge:
        # Spark's toPandas renders both as float nan inside arrays (an
        # array<bigint> with a NULL element comes back float64), DuckDB's
        # fetchdf returns masked arrays (mask = NULL) whose raw data slot
        # is a fill value. Both are canonized to one "NA" sentinel and
        # integral floats to int, so nested values compare on content;
        # top-level columns keep the strict NULL != NaN distinction.
        if isinstance(v, np.ma.MaskedArray):
            vals = [None if m else x for x, m in zip(v.data.tolist(), v.mask)] \
                if v.mask is not np.ma.nomask else v.data.tolist()
            return tuple(_canon_nested(x) for x in vals)
        return tuple(_canon_nested(x) for x in v)
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
    # DuckDB's fetchdf renders a NULL in a BOOLEAN column as float nan in
    # an object column (Spark gives None); a bool column can never hold a
    # real NaN, so nan -> None there is unambiguous
    for c in cols:
        if pdf[c].dtype == object:
            vals = pdf[c].dropna()
            if len(vals) and all(isinstance(x, (bool, np.bool_)) for x in vals):
                pdf = pdf.copy()
                pdf[c] = pdf[c].map(
                    lambda x: None if (isinstance(x, float) and math.isnan(x))
                    else x
                )
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
