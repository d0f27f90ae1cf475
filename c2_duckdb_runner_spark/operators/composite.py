"""Composite analytical queries — multi-operator TPC-H-adapted pipelines.

Single-operator registry entries prove each primitive; these prove the
primitives *compose*: multi-table join trees + selective filters + grouped
decimal aggregation + ordered top-k in one Catalyst plan, adapted to the
fixture star schema (FIXTURES.md §2 — column subsets of TPC-H Q3/Q5/Q8/Q10/
Q13/Q15). This is the shape of the declared capability the reference
delegates wholesale to its embedded engine (``main.cc:181-182``): arbitrary
analytical SQL over scanned files.

Scale notes (100 TB design point):
- Join trees put the fixed-size dims (nation, region) behind explicit
  ``broadcast()``; fact-fact joins (lineitem⨝orders) stay shuffled equi-joins
  that AQE can re-plan — the same tree a 1000-executor cluster wants.
- Every money aggregate routes through DECIMAL (associative, merge-order
  free) per the registry discipline, then surfaces as DOUBLE.
- Top-k uses ``orderBy().limit()`` which Spark executes as
  TakeOrderedAndProject: per-partition heaps + a driver merge of k rows, no
  global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.operators.aggregates import dsum
from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


def _revenue() -> F.Column:
    """sum(l_extendedprice * (1 - l_discount)) — decimal-exact, as double."""
    return (
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
)


@register(
    "composite_shipping_priority",
    oracle=f"""
SELECT l_orderkey, {_REVENUE_SQL} AS revenue, o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def composite_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-table join, selective filters on both fact sides,
    grouped revenue, deterministic top-10 (ties broken by date + orderkey so
    the LIMIT is a total order)."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue())
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "composite_local_supplier_volume",
    oracle=f"""
SELECT n_name, {_REVENUE_SQL} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def composite_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join tree with the extra customer-nation =
    supplier-nation co-location constraint. nation/region are fixed-size at
    any SF — broadcast; the lineitem⨝orders⨝(customer,supplier) spine stays
    a shuffled equi-join chain Catalyst/AQE reorders freely."""
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue())
    )


@register(
    "composite_market_share",
    oracle=f"""
WITH vol AS (
  SELECT YEAR(o_orderdate) AS o_year, n_name,
         {_REVENUE_SQL} AS nation_vol
  FROM lineitem, orders, supplier, nation
  WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
    AND s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT o_year, n_name,
       ROUND(nation_vol / SUM(nation_vol) OVER (PARTITION BY o_year), 6)
         AS mkt_share
FROM vol
""",
)
def composite_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: supplier-nation share of yearly revenue — join tree →
    grouped decimal agg → window-over-aggregate normalization. The window
    repartitions only the (year, nation) aggregate (tiny), never the fact."""
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.year("o_orderdate").alias("o_year"), F.col("n_name")
        )
        .agg(_revenue().alias("nation_vol"))
    )
    w = Window.partitionBy("o_year")
    return vol.select(
        "o_year",
        "n_name",
        F.round(F.col("nation_vol") / F.sum("nation_vol").over(w), 6).alias(
            "mkt_share"
        ),
    )


@register(
    "composite_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {_REVENUE_SQL} AS revenue, c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def composite_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue in a window — 4-table
    join, grouped decimal agg, top-20 with custkey tiebreak (total order)."""
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "composite_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
   AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def composite_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram — outer join with a
    join-side residual predicate, then two cascaded aggregations. All-integer
    outputs: no float discipline needed."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "composite_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {_REVENUE_SQL} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, rev
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def composite_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max windowed revenue. The max is a
    rank-1 window over the per-supplier aggregate (ties all kept, matching
    the scalar-subquery formulation; decimal sums make ties exact). The
    window input is the aggregate (|suppliers| rows), not the fact table."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    w = Window.orderBy(F.col("total_revenue").desc())
    top = (
        rev.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(top), supp.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "composite_big_spender_orders",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 90
  )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def composite_big_spender_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold —
    aggregate-derived semi-join filter feeding a 3-table join + re-aggregate.
    The HAVING subquery becomes a left-semi join on the grouped fact, the
    classic two-pass large-group pattern (no driver-side collect)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 90)
        .select("l_orderkey")
    )
    orders = load(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
    )
