"""Run every registered query against the DuckDB oracle — the same
differential the driver's CORRECTNESS gate runs (at sf0.001 here for speed;
set C2SPARK_TEST_SF_DIR=/root/testdata/sf0.01 for the driver-scale check).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.compare import assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert rows[0]["n"] > 0


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    spark_pdf = df.toPandas()
    sql = ORACLES.get(key)
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        assert spark_pdf is not None
        return
    duck_pdf = duck.execute(sql).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, key)
