"""Window-function surface (delegated by the reference at ``main.cc:181-182``).

Every window below pins a TOTAL order inside the partition (tie-broken by a
unique key) — without that, rank/lag/frame results are nondeterministic in
both engines and no oracle comparison is meaningful.

Scale: one shuffle per distinct partitioning key set; partitionBy keys here
(custkey, user_id) are high-cardinality, so partitions stay small and no
single task sorts more than one key group's rows. The empty-partitionBy
global-window case is deliberately absent from the hot path: it serializes
to one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "window_row_number",
    oracle=(
        "SELECT o_custkey, o_orderkey, rn FROM ("
        " SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER "
        "  (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS rn"
        " FROM orders) t WHERE rn <= 3"
    ),
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 orders per customer — row_number over a total order."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_dense",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC NULLS LAST, l_linenumber NULLS FIRST)"
        " AS rk, "
        "DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity "
        "DESC NULLS LAST, l_linenumber NULLS FIRST) AS drk "
        "FROM lineitem"
    ),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() and dense_rank() over a per-order frame: ties share a rank,
    dense_rank leaves no gaps; deterministic via the linenumber tiebreak."""
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(), "l_linenumber"
    )
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@register(
    "window_lag_lead",
    oracle=(
        "SELECT user_id, event_id, "
        "LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) AS prev_value, "
        "LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) AS next_value "
        "FROM events"
    ),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event value per user — the time-series staple."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


@register(
    "window_running_sum",
    oracle=(
        "SELECT o_custkey, o_orderkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))"
        " OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend "
        "FROM orders"
    ),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer. The frame order is total, and the sum is
    decimal-exact, so the running values are reproducible bit-for-bit."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_moving_frame",
    oracle=(
        "SELECT user_id, event_id, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS move_sum, "
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS move_n "
        "FROM events"
    ),
)
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame — 3-event moving sum/count per user."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("move_sum"),
        F.count("*").over(w).alias("move_n"),
    )


@register(
    "window_ntile_percent",
    oracle=(
        "SELECT o_orderkey, "
        "NTILE(4) OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey) AS quartile, "
        "ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice NULLS FIRST, o_orderkey), 6) AS pct_rank "
        "FROM orders"
    ),
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile/percent_rank (single-task window — fine for ranking a
    pre-aggregated/pre-filtered set, never a raw fact table at scale)."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "window_first_last",
    oracle=(
        "SELECT DISTINCT user_id, "
        "FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) "
        " AS first_event, "
        "LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id "
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event "
        "FROM events"
    ),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user first/last event — note LAST_VALUE needs the full-partition
    frame (default frame stops at CURRENT ROW in both engines)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_event"),
            F.last("event_type").over(wfull).alias("last_event"),
        )
        .distinct()
    )


@register(
    "window_count_distinct_running",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST(count(DISTINCT l_suppkey) OVER (
         PARTITION BY l_orderkey
         ORDER BY l_linenumber, l_partkey, l_suppkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS nd_supp
FROM lineitem
""",
)
def window_count_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per order: Spark windows reject DISTINCT
    aggregates outright, so the idiomatic rewrite is size(collect_set())
    over the same growing frame — set semantics give distinctness, size
    gives the count. Frame is rows-based with a TOTAL order — the fixture
    duplicates l_linenumber within an order, so the sort key is widened to
    (l_linenumber, l_partkey, l_suppkey), unique per order, making both
    engines see identical row prefixes. Per-group
    state is the distinct-set, bounded by the 7-line order cap — at 100 TB
    the partition key (l_orderkey) distributes and no group is skewed."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.size(F.collect_set("l_suppkey").over(w)).alias("nd_supp"),
    )
