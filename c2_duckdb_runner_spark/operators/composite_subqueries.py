"""Composite queries II — subquery / semi-anti / correlated TPC-H shapes.

``composite.py`` covers the plain join-tree pipelines (Q3/Q5/Q8/Q10/Q13/Q15/
Q18 shapes); this module finishes the TPC-H query-shape inventory with the
forms that exercise Catalyst's subquery machinery — the rest of the declared
"arbitrary SQL over scanned files" surface the reference delegates to its
embedded engine (``main.cc:181-182``), adapted to the fixture star schema:

- EXISTS / NOT EXISTS       → left-semi / left-anti joins        (Q4, Q22)
- correlated scalar agg     → grouped pre-agg + equi-join back   (Q2, Q17)
- HAVING vs global scalar   → tiny cross-join of one agg row     (Q11)
- disjunctive join filter   → equi-key extraction + pushdown     (Q19)
- IN (grouped HAVING set)   → semi-join on aggregated keys       (Q20)
- double EXISTS/NOT-EXISTS  → one-pass per-group stats rewrite   (Q21)

Scale notes (100 TB design point):
- Correlated subqueries are *decorrelated by hand* into grouped pre-
  aggregates joined back on the correlation key: one shuffle each, no
  per-row re-scan; DuckDB runs the literal correlated form as the oracle so
  the rewrite's semantics are pinned differentially.
- Scalar subqueries (global sums/avgs) become 1-row DataFrames cross-joined
  in — Spark plans that as BroadcastNestedLoopJoin over a single row, free
  at any scale.
- The Q21 double-subquery becomes ONE extra aggregation over the already-
  joined fact (per-order distinct-supplier stats) instead of two correlated
  re-scans of lineitem — the canonical MPP rewrite.
- Comparisons that gate rows (HAVING thresholds, correlated bounds) are
  computed with byte-identical expression trees in both engines — exact
  DECIMAL where possible, identical IEEE double ops otherwise — so no row
  can fall on a different side of the boundary in Spark vs the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.operators.aggregates import dsum
from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


def _rev_dec() -> F.Column:
    """Decimal-exact revenue term sum (merge-order free), surfaced DOUBLE."""
    return (
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# Q4 — EXISTS → left-semi join with a non-equi residual
# ---------------------------------------------------------------------------
@register(
    "composite_order_priority_exists",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def composite_order_priority_exists(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q4 shape: EXISTS(lineitem shipped after order date) as a
    left-semi join whose condition mixes the equi key with a non-equi
    residual — Spark hashes on the key and filters the residual in the
    probe, one shuffle, no duplicate-orders blowup."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 — selective scan → ungrouped decimal aggregate
# ---------------------------------------------------------------------------
@register(
    "composite_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
)
def composite_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: three pushed-down predicates → one global decimal
    sum. The whole query is scan + partial agg + 1-row merge; predicates
    reach the parquet reader (PushedFilters) so row groups skip."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q7 — nation-pair disjunction over a 6-table tree
# ---------------------------------------------------------------------------
@register(
    "composite_nation_trade_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INTEGER) AS l_year, {_REV_SQL} AS revenue
FROM lineitem, orders, customer, supplier, nation n1, nation n2
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
""",
)
def composite_nation_trade_volume(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q7 shape: two aliases of the nation dim (supplier side vs
    customer side) with a symmetric pair disjunction. Both nation copies
    broadcast (fixed 25 rows at any SF); the disjunction filters after the
    two broadcast hash joins, so the fact spine shuffles only on its equi
    keys."""
    nat = load(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("n1_key"))
        .join(n2, cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_rev_dec())
    )


# ---------------------------------------------------------------------------
# Q9 — product profit by nation × year
# ---------------------------------------------------------------------------
@register(
    "composite_product_profit",
    oracle="""
SELECT n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       ROUND(
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE)
         - 0.1 * CAST(SUM(CAST(p_retailprice * l_quantity AS DECIMAL(18,2)))
                      AS DOUBLE),
         6) AS profit
FROM lineitem, part, supplier, nation, orders
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
  AND p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def composite_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in the fixture): profit = revenue minus
    10% of retail cost of goods, by supplier nation and order year. The two
    money terms are aggregated as separate exact DECIMAL sums and combined
    once per output group in DOUBLE (then rounded) — identical expression
    tree in the oracle, so merge order can't drift the hash."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                ).cast("double")
                - 0.1
                * F.sum(
                    (F.col("p_retailprice") * F.col("l_quantity")).cast(
                        "decimal(18,2)"
                    )
                ).cast("double"),
                6,
            ).alias("profit")
        )
    )


# ---------------------------------------------------------------------------
# Q11 — HAVING against a global-sum scalar subquery
# ---------------------------------------------------------------------------
@register(
    "composite_top_revenue_nations",
    oracle=f"""
SELECT n_name, {_REV_SQL} AS revenue
FROM lineitem, orders, customer, nation
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND c_nationkey = n_nationkey
GROUP BY n_name
HAVING {_REV_SQL} > 0.04 * (
  SELECT {_REV_SQL}
  FROM lineitem, orders, customer, nation
  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n_nationkey
)
""",
)
def composite_top_revenue_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q11 shape: per-group sum kept only when above a fraction of
    the GLOBAL sum. The grouped aggregate is computed once and reused for
    both sides — the global total is re-aggregated from the 25 group rows
    and cross-joined back as a single broadcast row (the oracle re-scans,
    per the literal SQL; the sums are exact decimals so both routes agree
    to the bit)."""
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    grouped = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ).alias("rev_dec")
        )
    )
    total = grouped.agg(
        F.sum("rev_dec").cast("double").alias("total_rev")
    )
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("rev_dec").cast("double") > 0.04 * F.col("total_rev"))
        .select("n_name", F.col("rev_dec").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q12 — conditional (CASE) aggregation after a fact-fact join
# ---------------------------------------------------------------------------
@register(
    "composite_priority_linestatus",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
)
def composite_priority_linestatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus standing in for l_shipmode): pivot-by-
    CASE counts of urgent vs non-urgent orders per line status. Integer
    conditional sums — exact under any merge order."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14 — ratio of two conditional decimal sums
# ---------------------------------------------------------------------------
@register(
    "composite_promo_revenue_share",
    oracle="""
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE),
  6) AS promo_share
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
""",
)
def composite_promo_revenue_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q14 shape: promo revenue as a percentage of total — two exact
    decimal sums over one joined pass, divided once in DOUBLE and rounded.
    Single-row output."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# Q16 — NOT IN (anti-join) + COUNT(DISTINCT) by part attributes
# ---------------------------------------------------------------------------
@register(
    "composite_supplier_count_by_part",
    oracle="""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
""",
)
def composite_supplier_count_by_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per part attribute bucket,
    excluding blacklisted suppliers. NOT IN (no NULLs in the key) is a
    left-anti join against the tiny negative-balance supplier set; the
    COUNT(DISTINCT) expands to a two-level aggregate Spark executes as
    partial-distinct → final, no row explosion."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 14, 23, 45))
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — correlated per-key average threshold
# ---------------------------------------------------------------------------
@register(
    "composite_small_quantity_revenue",
    oracle="""
SELECT CAST(
  (2 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 1000000
       AS BIGINT) + 7) // 14
  AS BIGINT) AS avg_yearly_micro
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#12'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(l2.l_quantity))
    FROM lineitem l2
    WHERE l2.l_partkey = p_partkey
  )
""",
)
def composite_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape: rows below 20% of their part's average quantity.
    The correlated AVG decorrelates into one grouped pre-aggregate per
    partkey (computed only for the brand's parts via a semi-join first),
    joined back on the correlation key — one extra shuffle instead of a
    per-row re-scan. The threshold expression (0.2 * (decimal-sum-as-double
    / count)) is IEEE-identical to the oracle's, so boundary rows agree.

    The yearly average ships as EXACT INTEGER MICROS (avg_yearly_micro =
    round(sum/7) at 1e-6; multiplier 1e6 so the name and grid agree —
    r9 advice caught the earlier 1e4 mismatch), computed as
    floor((2*sum_micros + 7)/14) in int64 (positive operands, so Duck's
    floor `//` and Spark's truncating `div` agree; headroom ~2.2e16 at
    100x, well inside int64). The round-9 100x sweep caught the previous
    ROUND(double, 6) fold: at 100x the sum is ~1.1e10, where
    ulp(sum/7) ~ 2.4e-7 exceeds the 1e-6 rounding grid's precision and
    the engines' ROUND picked DIFFERENT nearest doubles (...285714 vs
    ...285715). Sub-ulp rounding of large doubles is not cross-engine
    stable; decimal/integer routing is (SURVEY §5.4 discipline)."""
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    thresholds = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg(
            (
                0.2
                * (
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast(
                        "double"
                    )
                    / F.count("l_quantity")
                )
            ).alias("qty_threshold")
        )
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s")
        )
        .select(
            F.expr(
                "CAST((2 * CAST(s * 1000000 AS BIGINT) + 7) div 14 AS BIGINT)"
            ).alias("avg_yearly_micro")
        )
    )


# ---------------------------------------------------------------------------
# Q19 — disjunction of conjunctive blocks as a join filter
# ---------------------------------------------------------------------------
@register(
    "composite_disjunctive_predicates",
    oracle=f"""
SELECT {_REV_SQL} AS revenue
FROM lineitem, part
WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
       AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
       AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_partkey = l_partkey AND p_brand = 'Brand#34'
       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)
def composite_disjunctive_predicates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape: OR of three conjunctive blocks, each repeating the
    equi key. Catalyst factors the common ``p_partkey = l_partkey`` out of
    the disjunction (so the join stays a hash join, not a nested loop) and
    pushes the single-side implied filters (brand/size union, quantity
    union) down to each scan."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    block = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = (li.l_partkey == part.p_partkey) & (
        block("Brand#12", 5, 1, 11)
        | block("Brand#23", 10, 10, 20)
        | block("Brand#34", 15, 20, 30)
    )
    return li.join(part, cond).agg(_rev_dec())


# ---------------------------------------------------------------------------
# Q20 — IN over a grouped-HAVING key set
# ---------------------------------------------------------------------------
@register(
    "composite_supplier_qty_share",
    oracle="""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem, part
  WHERE p_partkey = l_partkey AND p_name LIKE 'small%'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 2000
)
""",
)
def composite_supplier_qty_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved more than a threshold quantity
    of the filtered parts. The IN-subquery is an aggregate-then-semi-join:
    group lineitem (pre-filtered through the part semi-join) by supplier,
    keep keys over the exact-decimal threshold, semi-join supplier. The
    filter side shrinks to ≤ |suppliers| rows before touching the outer
    table."""
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq"))
        .filter(F.col("sq") > 2000)
        .select("l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier")
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_acctbal")


# ---------------------------------------------------------------------------
# Q21 — EXISTS + NOT EXISTS → one-pass per-group stats rewrite
# ---------------------------------------------------------------------------
@register(
    "composite_waiting_orders",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def composite_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order ("late" = shipped >60 days after the
    order date). The EXISTS/NOT-EXISTS pair decorrelates into one grouped
    pass over the joined fact: per order, distinct suppliers overall and
    distinct LATE suppliers; a late line survives iff (suppliers > 1 AND
    late-suppliers == 1) — its own supplier is then necessarily the sole
    late one. One extra aggregation replaces two correlated lineitem
    re-scans; both formulations are pinned equal by the oracle."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    stats = lines.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        lines.filter(F.col("is_late"))
        .join(
            stats.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
            "left_semi",
        )
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        sole_late.join(supp, sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q2 — correlated MIN over a derived part↔supplier relation
# ---------------------------------------------------------------------------
@register(
    "composite_min_acctbal_supplier",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_partkey, s_name, s_acctbal, n_name
FROM ps, part, supplier, nation, region
WHERE ps.l_partkey = p_partkey AND ps.l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND p_type = 'STANDARD' AND p_size IN (15, 25, 35)
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM ps ps2, supplier s2, nation n2, region r2
    WHERE ps2.l_partkey = p_partkey AND ps2.l_suppkey = s2.s_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
  )
""",
)
def composite_min_acctbal_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q2 shape (part↔supplier relation derived from lineitem, no
    partsupp in the fixture; s_acctbal standing in for ps_supplycost): for
    each selected part, its EUROPE supplier(s) with the minimum account
    balance. The correlated MIN decorrelates into a grouped min over the
    same qualified relation, joined back on (partkey, min value) — MIN is
    pure selection (no arithmetic), so the double equality is exact in both
    engines. The distinct part↔supplier pair extraction is one shuffle,
    reused for both the outer and the min side via self-agg."""
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    nat = F.broadcast(load(spark, sf_dir, "nation"))
    reg = F.broadcast(
        load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    esupp = (
        load(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == nat.n_nationkey)
        .join(reg, F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").isin(15, 25, 35)
    ).select("p_partkey")
    qualified = (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(esupp, pairs.l_suppkey == esupp.s_suppkey)
    )
    # NOTE: the oracle's correlated MIN is over ALL pairs of the part (no
    # part-side filter inside the subquery), but equality with the outer
    # p_partkey restricts it to the same part set — the grouped min over
    # `qualified` is the identical relation.
    mins = qualified.groupBy(F.col("p_partkey").alias("m_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        qualified.join(
            mins,
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("p_partkey", "s_name", "s_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q22 — scalar-average gate + NOT EXISTS anti-join
# ---------------------------------------------------------------------------
@register(
    "composite_inactive_customers",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
""",
)
def composite_inactive_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape (mktsegment standing in for the phone country code;
    "no urgent orders" standing in for "no orders", which is empty on this
    fixture): above-average-balance customers with no urgent order, counted
    per segment. The scalar AVG is one broadcast row cross-joined in; the
    NOT EXISTS is a left-anti join against the urgent-order custkeys."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_bal")
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
