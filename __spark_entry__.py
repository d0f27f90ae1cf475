"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``c2_duckdb_runner_spark.registry`` — all queries and oracle
SQL live there (one registration per SURVEY.md §2 inventory row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from c2_duckdb_runner_spark import registry
from c2_duckdb_runner_spark.operators.tier_a import flagship
from c2_duckdb_runner_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_confs(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() key."""
    return registry.oracle_sql()
