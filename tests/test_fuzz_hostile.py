"""Hostile-fixture fuzz differential (round-10 verdict ask #4).

The clean fixtures are all-ASCII and NULL-light — which is why X5
(Unicode case mapping) was excludable and why D8 (SPLIT_PART
NULL-swallowing) hid for 18,000 predicates. This leg re-runs the seeded
differential over DETERMINISTIC hostile twins of the six fuzz tables
(c2_duckdb_runner_spark/hostile.py): ~20% NULLs everywhere, empty and
non-ASCII strings, NaN/±inf/±1e308/-0.0/subnormal doubles, extreme int64
magnitudes, quote/backslash strings.

Grammar profile "hostile" drops UPPER/LOWER (X5 has no faithful dual
rendering once 'ß' is in the data); every other D-rendering must hold on
this data too. Divergences this leg found at introduction are ledgered as
H1.. in fuzzing.py's module docstring-adjacent FUZZFINDINGS section of
PERFORMANCE.md and pinned as trap tests below.
"""

from __future__ import annotations

import duckdb
import pytest

from c2_duckdb_runner_spark import fuzzing, hostile
from c2_duckdb_runner_spark.tables import load  # noqa: F401 (parity w/ clean leg)

N_SEEDS = 60
BATCH = 30
TABLES = list(fuzzing.FUZZ_TABLES)


@pytest.fixture(scope="module")
def hostile_views(spark, sf_dir, tmp_path_factory):
    """Build the hostile twins once, register on both engines."""
    out = str(tmp_path_factory.mktemp("hostile_fixtures"))
    hostile.make_hostile_fixtures(sf_dir, out)
    for t in TABLES:
        spark.read.parquet(f"{out}/{t}.parquet").createOrReplaceTempView(
            f"hz_{t}"
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW hz_{t} AS SELECT * FROM '{out}/{t}.parquet'"
        )
    yield con
    con.close()


def _run_batch(spark, con, table: str, seeds: list[int]):
    preds = [
        fuzzing.gen_predicate(table, s, profile="hostile") for s in seeds
    ]
    ssql = fuzzing.fingerprint_sql(table, preds, "spark").replace(
        f"FROM {table}", f"FROM hz_{table}"
    )
    dsql = fuzzing.fingerprint_sql(table, preds, "duck").replace(
        f"FROM {table}", f"FROM hz_{table}"
    )
    srow = spark.sql(ssql).collect()[0]
    drow = con.execute(dsql).fetchone()
    for i, s in enumerate(seeds):
        a = (srow[2 * i], srow[2 * i + 1])
        b = (drow[2 * i], drow[2 * i + 1])
        assert a == b, (
            f"hostile {table} seed={s}: spark {a} != duck {b}\n"
            f"  spark: {preds[i].spark}\n  duck:  {preds[i].duck}"
        )


@pytest.mark.parametrize("table", TABLES)
@pytest.mark.parametrize("lo", range(0, N_SEEDS, BATCH))
def test_hostile_fuzz_predicates(spark, hostile_views, table, lo):
    _run_batch(spark, hostile_views, table, list(range(lo, lo + BATCH)))


@pytest.mark.parametrize("table", TABLES)
@pytest.mark.parametrize("seed", range(3))
def test_hostile_fuzz_select_exprs(spark, hostile_views, table, seed):
    q = fuzzing.gen_select_batch(table, seed, profile="hostile")
    ssql = q.spark.replace(f"FROM {table}", f"FROM hz_{table}")
    dsql = q.duck.replace(f"FROM {table}", f"FROM hz_{table}")
    srow = tuple(spark.sql(ssql).collect()[0])
    drow = tuple(hostile_views.execute(dsql).fetchone())
    assert srow == drow, (
        f"hostile select {table} seed={seed}: {srow} != {drow}\n"
        f"  spark: {ssql[:500]}\n  duck:  {dsql[:500]}"
    )


# ---------------------------------------------------------------------------
# Pinned hostile-divergence traps (H1-H3): each asserts the raw divergence
# is REAL on this container, so an engine upgrade that closes it surfaces
# as a failure here and the guard rendering can be retired.
# ---------------------------------------------------------------------------


def _duck1(expr):
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {expr}").fetchone()[0]
    finally:
        con.close()


def _spark1(spark, expr):
    return spark.sql(f"SELECT {expr}").collect()[0][0]


def test_trap_h1_trig_on_infinity(spark):
    import math

    with pytest.raises(Exception, match="(?i)out of range"):
        _duck1("SIN('inf'::DOUBLE)")
    assert math.isnan(_spark1(spark, "SIN(CAST('Infinity' AS DOUBLE))"))


def test_trap_h2_ceil_floor_bigint(spark):
    import math

    assert math.isnan(_duck1("CEIL('nan'::DOUBLE)"))
    assert _spark1(spark, "CEIL(CAST('NaN' AS DOUBLE))") == 0
    assert _duck1("CEIL(1e300)") == 1e300
    assert _spark1(spark, "CEIL(1e300)") == 9223372036854775807
    # the grammar's rendering: identity for |x| >= 2^53 (already integral)
    assert _spark1(
        spark,
        "CASE WHEN isnan(1e300) OR abs(1e300) >= 9.007199254740992E15D "
        "THEN 1e300 ELSE CAST(CEIL(1e300) AS DOUBLE) END",
    ) == 1e300


def test_trap_h3_json_malformed(spark):
    with pytest.raises(Exception, match="(?i)malformed json"):
        _duck1("json_extract_string('not json', '$.k')")
    assert _spark1(spark, "GET_JSON_OBJECT('not json', '$.k')") is None
    assert _duck1(
        "CASE WHEN json_valid('not json') "
        "THEN json_extract_string('not json', '$.k') END"
    ) is None


def test_trap_h4_duckdb_case_datetrunc_isnull_misfold(tmp_path):
    """ORACLE-ENGINE bug found by the hostile leg (lineitem seed 369):
    DuckDB 1.0.0 folds SUM(CASE WHEN DATE_TRUNC(col) IS NULL ...) to 0
    even when the column has NULLs — the equivalent FILTER form counts
    correctly, i.e. DuckDB disagrees with itself. The fingerprint
    compiler renders the Duck side through FILTER because of this."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([None, 1_000_000_000], pa.timestamp("us"))}),
        p,
    )
    con = duckdb.connect()
    case_form = con.execute(
        f"SELECT SUM(CASE WHEN DATE_TRUNC('day', ts) IS NULL THEN 1 "
        f"ELSE 0 END) FROM '{p}'"
    ).fetchone()[0]
    filter_form = con.execute(
        f"SELECT COUNT(*) FILTER (DATE_TRUNC('day', ts) IS NULL) FROM '{p}'"
    ).fetchone()[0]
    assert filter_form == 1  # the correct answer
    assert case_form == 0  # the bug — retire the FILTER routing when fixed
    # second manifestation: WHERE pushdown drops the rows entirely
    where_form = con.execute(
        f"SELECT COUNT(*) FROM '{p}' WHERE DATE_TRUNC('day', ts) IS NULL"
    ).fetchone()[0]
    assert where_form == 0  # also the bug
    # third manifestation: TWO FILTER aggregates sharing the expression
    # re-trigger the misfold through common-subexpression elimination —
    # each aggregate ALONE is correct (this is why ts expressions are
    # excluded from the grammar's IS NULL slot: the oracle engine cannot
    # evaluate the shape reliably in any compound query)
    both = con.execute(
        f"SELECT COUNT(*) FILTER (DATE_TRUNC('day', ts) IS NULL), "
        f"COALESCE(SUM(1) FILTER (DATE_TRUNC('day', ts) IS NULL), 0) "
        f"FROM '{p}'"
    ).fetchone()
    assert both == (0, 0)  # the CSE bug — both wrong together
