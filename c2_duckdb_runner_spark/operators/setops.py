"""Set-operation surface.

Oracle-parity trap (SURVEY.md §2 ``set_union_all``): SQL UNION deduplicates;
DataFrame ``union()`` does NOT (it is UNION ALL). Each entry states which
semantics it implements and the oracle SQL encodes the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


def _cust_nations(spark, sf_dir):
    return load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "set_union_all",
    oracle=(
        "SELECT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer "
        "UNION ALL SELECT s_nationkey FROM supplier) t"
    ),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.union == SQL UNION ALL (bag semantics, no shuffle at all)."""
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "UNION SELECT s_nationkey FROM supplier"
    ),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION = union + distinct (one dedup shuffle)."""
    return (
        _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()
    )


@register(
    "set_intersect",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "INTERSECT SELECT s_nationkey FROM supplier"
    ),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct intersection (nations having both customers and suppliers)."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "set_except",
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "EXCEPT SELECT s_nationkey FROM supplier"
    ),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct difference (nations with customers but no suppliers)."""
    return _cust_nations(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "set_intersect_all",
    oracle=(
        "SELECT l_quantity AS q FROM lineitem WHERE l_orderkey % 2 = 0 "
        "INTERSECT ALL SELECT l_quantity FROM lineitem WHERE l_orderkey % 2 = 1"
    ),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — multiplicity = min of the two sides."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter("l_orderkey % 2 = 0").select(F.col("l_quantity").alias("q"))
    b = li.filter("l_orderkey % 2 = 1").select(F.col("l_quantity").alias("q"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle=(
        "SELECT l_quantity AS q FROM lineitem WHERE l_orderkey % 2 = 0 "
        "EXCEPT ALL SELECT l_quantity FROM lineitem WHERE l_orderkey % 2 = 1"
    ),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — multiplicity = max(0, left - right)."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter("l_orderkey % 2 = 0").select(F.col("l_quantity").alias("q"))
    b = li.filter("l_orderkey % 2 = 1").select(F.col("l_quantity").alias("q"))
    return a.exceptAll(b)
