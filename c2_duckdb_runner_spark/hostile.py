"""Hostile fuzz-fixture generator (round-10 verdict ask #4).

The driver fixtures are all-ASCII and NULL-light — which is exactly why
the X5 exclusion (Unicode case mapping) was excludable and why NULL-path
bugs like D8 (SPLIT_PART NULL-swallowing) took an 18,000-predicate
widening run to surface. This module rewrites the six fuzz tables at
sf0.001 into deterministic HOSTILE twins that keep the schema but inject
the value classes the clean fixtures never exercise:

- ~20% NULLs into every non-key column (NULL-propagation paths)
- empty strings and single-space strings (boundary string ops)
- non-ASCII text: multi-byte UTF-8, one-to-many case-mapping chars,
  combining marks, CJK, an emoji (byte-vs-codepoint semantics)
- strings embedding quotes and backslashes (escaping paths)
- +/-inf, NaN, +/-1e308, -0.0, and subnormal doubles (IEEE edge order
  and arithmetic)
- extreme int64 magnitudes (+/-1e15) in NON-KEY int columns — large
  enough to stress comparisons and remainders, small enough that the
  grammar's X10 no-overflow discipline (sums of <= ~16 terms) still
  holds in int64
- timestamps at the epoch boundary and far range ends (1901/2099)

Key columns are left untouched: the differential's (count, key-sum)
fingerprint needs exact key sums, and keys are row identities, not data.

Determinism: one numpy Generator seeded per (table, column) via crc32 —
the twin a CI run builds is byte-for-byte the twin a failure reproduces
against.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .fuzzing import FUZZ_TABLES

_HOSTILE_STRINGS = [
    "",  # empty
    " ",  # single space
    "  padded  ",  # trim bait
    "ß",  # one-to-many upper (X5)
    "ẞE",
    "İstanbul",  # dotted capital I
    "Łódź",
    "naïve",
    "éclair",  # combining acute
    "ΣΊΣΥΦΟΣ",  # final-sigma lowering
    "中文字符",
    "🦆 duck",
    "tab\tsep",
    "new\nline",
    "quote'quote",
    'double"quote',
    "back\\slash",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,  # long
    "%wild_card%",
    "0",
    "-1",
    "1e10",
    "NaN",
    "null",
]

_HOSTILE_DOUBLES = [
    float("inf"),
    float("-inf"),
    float("nan"),
    1e308,
    -1e308,
    -0.0,
    5e-324,  # smallest subnormal
    -5e-324,
    1e-300,
]

_HOSTILE_INTS = [
    10**15,
    -(10**15),
    -1,
    0,
    2**31,  # just past int32
    -(2**31) - 1,
]

NULL_FRAC = 0.20
HOSTILE_FRAC = 0.15  # of the non-null rows, how many get a hostile value


def _rng(table: str, col: str) -> np.random.Generator:
    return np.random.default_rng(
        zlib.crc32(f"{table}/{col}".encode("utf-8")) & 0xFFFFFFFF
    )


def _inject(table: str, col: str, values: list, pool: list) -> list:
    """NULL ~20% of rows and replace ~15% of the rest from `pool`.

    Returns a plain Python list; callers wrap it in pa.array with the
    column's own type (int width / float32-vs-64 must come from the
    caller's arr.type, not be inferred here)."""
    r = _rng(table, col)
    n = len(values)
    out = list(values)
    nulls = r.random(n) < NULL_FRAC
    hostile = r.random(n) < HOSTILE_FRAC
    picks = r.integers(0, len(pool), size=n)
    for i in range(n):
        if nulls[i]:
            out[i] = None
        elif hostile[i]:
            out[i] = pool[picks[i]]
    return out


def make_hostile_fixtures(src_dir: str, out_dir: str) -> None:
    """Write hostile twins of the six fuzz tables into out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    for table, spec in FUZZ_TABLES.items():
        t = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
        cols = {}
        for name in t.column_names:
            arr = t.column(name)
            vals = arr.to_pylist()
            if name == spec["key"]:
                cols[name] = arr  # keys stay exact — fingerprint identity
            elif name in spec["int"]:
                # respect the column's physical width (int32 columns take
                # only the pool values that fit)
                width = arr.type.bit_width
                lo, hi = -(2 ** (width - 1)), 2 ** (width - 1) - 1
                pool = [v for v in _HOSTILE_INTS if lo <= v <= hi] or [0, -1]
                cols[name] = pa.array(
                    _inject(table, name, vals, pool), type=arr.type
                )
            elif name in spec["double"]:
                cols[name] = pa.array(
                    _inject(table, name, vals, _HOSTILE_DOUBLES),
                    type=arr.type,
                )
            elif name in spec["str"] or name in spec["json"]:
                cols[name] = pa.array(
                    _inject(table, name, vals, _HOSTILE_STRINGS),
                    type=arr.type,
                )
            elif name in spec["ts"]:
                # NULL-inject only; range extremes differ in engine-side
                # calendar handling and deserve their own probe ledger
                r = _rng(table, name)
                nulls = r.random(len(vals)) < NULL_FRAC
                cols[name] = pa.array(
                    [None if nulls[i] else v for i, v in enumerate(vals)],
                    type=arr.type,
                )
            else:
                cols[name] = arr
        out = pa.table(cols)
        pq.write_table(out, os.path.join(out_dir, f"{table}.parquet"))
