"""Sort / limit / top-k surface.

Oracle-parity trap (SURVEY.md §2 ``sort_orderby``): DuckDB defaults to NULLS
LAST on ASC, Spark to NULLS FIRST — every ORDER BY here pins null placement
explicitly, and every LIMIT sits on a TOTAL order (unique tie-break) so the
selected row set is deterministic.

Scale: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each task
keeps a k-heap, the driver merges partials; no global sort is ever
materialized. A bare global ``orderBy`` (range-partitioned sort) exists only
in sort_orderby_multi, which is the "export sorted result" use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "sort_orderby_multi",
    oracle=(
        "SELECT c_custkey, c_nationkey, c_acctbal FROM customer "
        "ORDER BY c_nationkey ASC NULLS LAST, c_acctbal DESC NULLS LAST, c_custkey"
    ),
)
def sort_orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with pinned null order (range partitioner +
    per-partition sort behind the scenes)."""
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .orderBy(
            F.col("c_nationkey").asc_nulls_last(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey"),
        )
    )


@register(
    "limit_topk",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"
    ),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 orders by price → TakeOrderedAndProject (k-heap per task,
    merge on driver; never a full sort)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "limit_offset",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20"
    ),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: rows 21-30 of the price ranking."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(20)
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle=(
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM ("
        " SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, "
        "  ROW_NUMBER() OVER (PARTITION BY l_suppkey "
        "   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn"
        " FROM lineitem) t WHERE rn <= 2"
    ),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 line items per supplier — the grouped top-k idiom (window +
    row_number filter; Spark pushes the rank filter into the sort via
    WindowGroupLimit so each group materializes only k rows)."""
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@register(
    "sort_nulls_explicit",
    oracle=(
        "SELECT k, v FROM ("
        " SELECT c_custkey AS k, "
        "  CASE WHEN c_acctbal > 5000 THEN c_acctbal END AS v FROM customer) t "
        "ORDER BY v ASC NULLS FIRST, k LIMIT 50"
    ),
)
def sort_nulls_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST pinned under a LIMIT — the exact trap where engine
    defaults diverge (manufactured nulls: fixtures have none)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.when(F.col("c_acctbal") > 5000, F.col("c_acctbal")).alias("v"),
    )
    return c.orderBy(F.col("v").asc_nulls_first(), F.col("k")).limit(50)
