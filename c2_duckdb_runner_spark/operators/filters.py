"""Predicate surface — every WHERE-clause shape reachable through the
reference's filter slot (``main.cc:164-169``: the filter is an arbitrary SQL
boolean string handed to the engine at ``main.cc:182``).

All of these compile to a single scan stage with the predicate pushed into
the parquet reader (PushedFilters in .explain) — zero shuffle, which is the
whole point at 100 TB: the scan reads only row groups whose min/max stats
can pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "filter_compound",
    oracle=(
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE (l_quantity > 30 AND l_discount < 0.05) "
        "OR NOT (l_returnflag = 'N' OR l_tax > 0.02)"
    ),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition (& | ~)."""
    li = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)) | ~(
        (F.col("l_returnflag") == "N") | (F.col("l_tax") > 0.02)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@register(
    "filter_isin",
    oracle=(
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    ),
)
def filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate (set membership), a WHERE shape reachable through
    the reference filter slot (main.cc:164-169)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "filter_between",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_quantity BETWEEN 10 AND 20"
    ),
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range predicate, inclusive on both ends in both engines."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "filter_null_handling",
    oracle=(
        "SELECT o_orderkey, big_spend FROM ("
        "  SELECT o_orderkey, "
        "    CASE WHEN o_totalprice > 100000 THEN o_totalprice END AS big_spend"
        "  FROM orders) t "
        "WHERE big_spend IS NOT NULL AND o_orderkey IS NOT NULL"
    ),
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull/isNotNull — fixtures carry no nulls, so manufacture them with a
    partial CASE, then filter them back out (three-valued logic exercised)."""
    o = load(spark, sf_dir, "orders")
    derived = o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).alias(
            "big_spend"
        ),
    )
    return derived.filter(
        F.col("big_spend").isNotNull() & F.col("o_orderkey").isNotNull()
    )


@register(
    "filter_like",
    oracle=(
        "SELECT p_partkey, p_name FROM part "
        "WHERE p_name LIKE '%al%' AND p_brand NOT LIKE 'Brand#1%'"
    ),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE wildcard predicates, positive and negated, conjoined."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%al%") & ~F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_name")


@register(
    "filter_rlike",
    oracle=(
        "SELECT e.event_id, e.event_type FROM events e "
        "WHERE regexp_matches(e.event_type, '^(click|view)$')"
    ),
)
def filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate — pattern kept in the Java∩RE2 common dialect."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").rlike("^(click|view)$"))
        .select("event_id", "event_type")
    )


@register(
    "filter_string_predicates",
    oracle=(
        "SELECT c_custkey, c_name FROM customer "
        "WHERE starts_with(c_name, 'Customer#') "
        "AND contains(c_name, '1') AND ends_with(c_name, '0')"
    ),
)
def filter_string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """startswith/contains/endswith sugar — compiled to the same
    StringPredicate expressions the SQL surface reaches via LIKE."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").startswith("Customer#")
        & F.col("c_name").contains("1")
        & F.col("c_name").endswith("0")
    ).select("c_custkey", "c_name")


@register(
    "filter_subquery_in",
    oracle=(
        "SELECT o_orderkey, o_custkey FROM orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)"
    ),
)
def filter_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN <subquery> — Catalyst rewrites to a left-semi join; at scale the
    subquery side is small post-filter, so AQE turns it into a broadcast."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        "SELECT o_orderkey, o_custkey FROM v_orders "
        "WHERE o_custkey IN (SELECT c_custkey FROM v_customer WHERE c_acctbal > 5000)"
    )


@register(
    "filter_scalar_subquery",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)"
    ),
)
def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (decimal avg: exact, so the comparison
    threshold is bit-identical in both engines)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM v_orders "
        "WHERE o_totalprice > "
        "(SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM v_orders)"
    )
