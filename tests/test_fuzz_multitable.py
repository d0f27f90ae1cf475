"""Seeded multi-table fuzz differential: joins, subqueries, set ops.

Round-11 widening (VERDICT r10 ask #3). The reference's declared contract
is ANY DuckDB SQL through ``con.SendQuery`` (``main.cc:181-182``); the
WHERE / SELECT-list / GROUP BY / ORDER BY slots are fuzzed since r9/r10,
but joins, subqueries, and set operations were curated-only. This suite
locks seeded generated cases for all three (210 cases: 80 two-table
equi-joins, 60 membership-subquery batches = 240 IN/NOT IN/EXISTS/NOT
EXISTS predicates, 70 set operations incl. the ALL variants), each
dual-rendered through the fuzzing.py formatter ledger and compared on
one-row BIGINT fingerprints.

Seeds are FIXED and process-stable (crc32 salting); a failure reproduces
from the (pair, seed) tuple alone. tools/fuzz_explore.py --slot
join/sub/setop is the widening loop.
"""

from __future__ import annotations

import duckdb
import pytest

from c2_duckdb_runner_spark import fuzzing
from c2_duckdb_runner_spark.tables import load

TABLES = list(fuzzing.FUZZ_TABLES)
N_SEEDS = 10
SUB_PAIRS = [(a, b) for a, b, _ in fuzzing.JOIN_PAIRS[:6]]
SETOP_PAIRS = [(a, b) for a, b, _ in fuzzing.JOIN_PAIRS[:5]] + [
    ("lineitem", "lineitem"),
    ("documents", "documents"),
]


@pytest.fixture(scope="module")
def views(spark, duck, sf_dir):
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(f"fuzz_{t}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW fuzz_{t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _run_tagged_batch(spark, con, cases: list[tuple[str, fuzzing.Sql]]):
    """UNION ALL a list of same-schema one-row fingerprint queries (tagged
    by index) into ONE query per engine, then compare row-by-row."""
    ssql = " UNION ALL ".join(
        f"SELECT {i} AS i, * FROM ({q.spark})" for i, (_, q) in enumerate(cases)
    )
    dsql = " UNION ALL ".join(
        f"SELECT {i} AS i, * FROM ({q.duck})" for i, (_, q) in enumerate(cases)
    )
    srows = {r[0]: tuple(r)[1:] for r in spark.sql(ssql).collect()}
    drows = {r[0]: tuple(r)[1:] for r in con.execute(dsql).fetchall()}
    for i, (tag, q) in enumerate(cases):
        assert srows[i] == drows[i], (
            f"{tag}: spark {srows[i]} != duck {drows[i]}\n"
            f"  spark: {q.spark}\n  duck:  {q.duck}"
        )


@pytest.mark.parametrize("pair", fuzzing.JOIN_PAIRS,
                         ids=[f"{a}-{b}" for a, b, _ in fuzzing.JOIN_PAIRS])
def test_fuzz_joins(spark, views, pair):
    left, right, nat = pair
    cases = [
        (f"join {left}x{right} seed={s}",
         fuzzing.gen_join(left, right, s, nat, prefix="fuzz_"))
        for s in range(N_SEEDS)
    ]
    _run_tagged_batch(spark, views, cases)


@pytest.mark.parametrize("pair", SUB_PAIRS,
                         ids=[f"{a}-{b}" for a, b in SUB_PAIRS])
def test_fuzz_subqueries(spark, views, pair):
    outer, inner = pair
    cases = [
        (f"sub {outer}<-{inner} seed={s}",
         fuzzing.gen_subquery_batch(outer, inner, s, n=4, prefix="fuzz_"))
        for s in range(N_SEEDS)
    ]
    _run_tagged_batch(spark, views, cases)


@pytest.mark.parametrize("pair", SETOP_PAIRS,
                         ids=[f"{a}-{b}" for a, b in SETOP_PAIRS])
def test_fuzz_setops(spark, views, pair):
    ta, tb = pair
    cases = [
        (f"setop {ta}+{tb} seed={s}",
         fuzzing.gen_setop(ta, tb, s, prefix="fuzz_"))
        for s in range(N_SEEDS)
    ]
    _run_tagged_batch(spark, views, cases)


def test_multitable_generators_deterministic():
    for left, right, nat in fuzzing.JOIN_PAIRS:
        for s in (0, 9):
            assert fuzzing.gen_join(left, right, s, nat) == \
                fuzzing.gen_join(left, right, s, nat)
            assert fuzzing.gen_subquery_batch(left, right, s) == \
                fuzzing.gen_subquery_batch(left, right, s)
            assert fuzzing.gen_setop(left, right, s) == \
                fuzzing.gen_setop(left, right, s)


def test_fixture_tables_have_disjoint_column_namespaces():
    """Unqualified column references in generated multi-table SQL resolve
    identically in both engines ONLY because no two fixture tables share a
    column name — pin that invariant so a schema addition can't silently
    make the fuzz ambiguous."""
    seen: dict[str, str] = {}
    for t, spec in fuzzing.FUZZ_TABLES.items():
        for group in ("int", "double", "str", "ts", "json"):
            for c in spec[group]:
                assert c not in seen, (
                    f"column {c} in both {seen[c]} and {t}"
                )
                seen[c] = t
