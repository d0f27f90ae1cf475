"""Documented hostile-differential fences (r11).

Each entry excludes ONE registry key from the hostile-fixture differential
gate (tools/hostile_sweep.py) because its divergence class has NO faithful
dual rendering on hostile data — the engines' semantics genuinely differ
and neither side can express the other's. A fence is NOT a pass: the
sweep artifact reports fenced keys separately, every class below is
pinned by a witness trap test in tests/test_hostile_fences.py (so an
engine upgrade that closes the gap is noticed and the fence lifted), and
the clean-fixture differential still gates the key at sf0.001/sf0.01/100x.

Classes (the X-series continues fuzzing.py's exclusion ledger):

- X5-unicode-case: one-to-many/locale case mapping (UPPER('ß') -> 'SS'
  in Spark/ICU vs 'ẞ' in DuckDB/utf8proc; lower final-sigma 'Σ' -> 'σ/ς').
  Pre-r11 the fixture was all-ASCII where the engines agree.
- H-neg0-group: -0.0 vs 0.0 as a GROUP/DISTINCT key — Spark normalizes
  -0.0 to 0.0 before hashing (SPARK-32110), DuckDB keeps them distinct
  group keys. No query-side rewrite can make DuckDB's groups merge
  without also changing legitimate values.
- H-ties: the query ranks/picks within groups whose ordering was TOTAL on
  the clean fixture by construction (the repo's rank discipline) but the
  hostile injection creates DUPLICATE sort keys, making row_number/
  ntile/first-per-group order-dependent — both engines are internally
  consistent, there is no canonical winner to pin without changing the
  query's declared output shape.
- H-nan-order: NaN placement inside ordered/quantile aggregates
  (percentile_disc/median/approx sketches): Spark totals-orders NaN
  HIGHEST; DuckDB's ordered aggregates treat NaN differently from its
  ORDER BY. Affects only rows whose ordered set contains NaN.

FENCES maps key -> (class, reason). Keep reasons specific: name the
witness column/value from CORRECTNESS_hostile_r11.json.
"""

from __future__ import annotations

FENCES: dict[str, tuple[str, str]] = {}
