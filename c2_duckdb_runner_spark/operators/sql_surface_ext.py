"""SQL-surface extensions: FILTER-clause aggregates, ordered-set window
functions, width_bucket histograms, correlated LATERAL subqueries, interval
arithmetic, inline VALUES tables, boolean aggregates.

All of these are reachable through the reference's delegated SQL slot
(``main.cc:164-169`` splices an arbitrary expression; ``main.cc:181-182``
executes it in a full SQL engine), so capability parity requires each shape.
Everything here is built-in Catalyst surface — no UDFs, no custom rules.

Scale notes (100 TB design point):
- FILTER-clause aggregates fuse N conditional metrics into ONE hash
  aggregate pass (partial+final) instead of N filtered scans — the standard
  way to compute a metrics panel in a single shuffle.
- The LATERAL top-k decorrelates into a ranked window per join key, not a
  per-outer-row re-scan; Catalyst rewrites it to one shuffle on the
  correlation key.
- width_bucket is a pure projection (no shuffle); the histogram reduce is
  a 12-key aggregate — histogram cost is scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "agg_filter_clause",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
              FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
       CAST(COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax < 0.02) AS BIGINT)
         AS n_lowtax_supp
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER clause: four differently-conditioned metrics computed
    in ONE grouped aggregate pass — each aggregate sees only the rows its
    WHERE admits. The single-shuffle alternative to unioning N filtered
    subqueries; at scale this is how a metrics panel stays one scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.expr("count(*) FILTER (WHERE l_quantity > 25)").alias("n_bulk"),
        F.expr(
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))"
            " FILTER (WHERE l_discount > 0.05) AS DOUBLE)"
        ).alias("rev_discounted"),
        F.expr(
            "count(DISTINCT l_suppkey) FILTER (WHERE l_tax < 0.02)"
        ).alias("n_lowtax_supp"),
    )


@register(
    "window_nth_cume",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice NULLS FIRST, o_orderkey)
""",
)
def window_nth_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value(2) per priority class under a TOTAL order (price,
    tie-broken by key) so every rank is deterministic. nth_value's
    default frame (UNBOUNDED PRECEDING..CURRENT ROW) yields NULL until
    the frame holds two rows — pinned identically in both engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@register(
    "agg_histogram_bucket",
    oracle="""
SELECT CASE WHEN isnan(l_quantity) THEN NULL
            WHEN l_quantity < 0 THEN 0
            WHEN l_quantity >= 50 THEN 11
            ELSE CAST(FLOOR(l_quantity / 5.0) AS BIGINT) + 1 END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(l_quantity) AS DOUBLE) AS lo,
       CAST(MAX(l_quantity) AS DOUBLE) AS hi
FROM lineitem GROUP BY 1
""",
)
def agg_histogram_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket(v, 0, 50, 10): bucketing is a
    pure map-side projection and the reduce touches 12 keys, so histogram
    cost is scan-bound at any data size. The oracle spells out
    width_bucket's floor arithmetic ((hi-lo)/n = 5.0 exactly, so
    FLOOR(v/5)+1 is bit-identical)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(
                F.col("l_quantity"), F.lit(0.0), F.lit(50.0), F.lit(10)
            ).alias("bucket"),
            "l_quantity",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_quantity").cast("double").alias("lo"),
            F.max("l_quantity").cast("double").alias("hi"),
        )
    )


@register(
    "join_lateral_topk",
    oracle="""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
""",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY..LIMIT: the two
    highest-balance customers per nation, expressed as a per-outer-row
    subquery. Catalyst decorrelates it into a ranked window on the
    correlation key — one shuffle on c_nationkey, never a per-nation
    re-scan of customer. Ties broken by c_custkey for determinism."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql("""
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation_lat n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer_lat c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) t
""")


@register(
    "fn_interval_arith",
    oracle="""
SELECT o_orderkey,
       epoch_ms(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY) AS due_ms,
       epoch_ms(CAST(o_orderdate AS TIMESTAMP) - INTERVAL 12 HOUR) AS cutoff_ms,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since,
       CAST(date_diff('day', DATE '1970-01-01', last_day(CAST(o_orderdate AS DATE)))
            AS BIGINT) AS eom_epoch_day
FROM orders
""",
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: timestamp ± day/hour intervals, day-grain
    differences against an epoch anchor, and last_day-of-month — all
    emitted as integer millis/days so ns-vs-µs precision differences can't
    touch the hash. Pure projection; pushdown-safe."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # orders.o_orderdate loads as TIMESTAMP_NTZ; session tz is pinned UTC
        # so the cast to TIMESTAMP is an identity relabel, not a shift.
        F.unix_millis(
            F.expr("CAST(o_orderdate + INTERVAL '30' DAY AS TIMESTAMP)")
        ).alias("due_ms"),
        F.unix_millis(
            F.expr("CAST(o_orderdate - INTERVAL '12' HOUR AS TIMESTAMP)")
        ).alias("cutoff_ms"),
        F.datediff(F.col("o_orderdate").cast("date"), F.to_date(F.lit("1995-01-01")))
        .cast("long")
        .alias("days_since"),
        F.datediff(
            F.last_day(F.col("o_orderdate").cast("date")),
            F.to_date(F.lit("1970-01-01")),
        )
        .cast("long")
        .alias("eom_epoch_day"),
    )


@register(
    "values_inline_table",
    oracle="""
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(t.w) AS BIGINT) AS weighted_n
FROM events e
JOIN (VALUES ('view', 1), ('click', 5), ('purchase', 25)) AS t(event_type, w)
  ON e.event_type = t.event_type
GROUP BY e.event_type
""",
)
def values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation joined against a fact table: the literal
    weight map lives in the query text (no file, no temp table) and the
    join is a broadcast of a 3-row relation. Unmatched event types drop
    out (inner join) — the standard scorecard-weights shape."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_vi")
    return spark.sql("""
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(t.w) AS BIGINT) AS weighted_n
FROM events_vi e
JOIN (VALUES ('view', 1), ('click', 5), ('purchase', 25)) AS t(event_type, w)
  ON e.event_type = t.event_type
GROUP BY e.event_type
""")


@register(
    "agg_bool_countif",
    oracle="""
SELECT l_linestatus,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_disc,
       bool_and(l_quantity > 0) AS all_pos_qty,
       bool_or(l_tax > 0.07) AS any_hi_tax,
       bool_and(l_extendedprice > 0) AS every_pos_price
FROM lineitem GROUP BY l_linestatus
""",
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: count_if / bool_and / bool_or / every — the
    assertion layer of data-quality checks, evaluated as a single grouped
    pass (booleans partial-aggregate as AND/OR monoids, so map-side
    combine applies)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.expr("count_if(l_discount > 0.05)").alias("n_disc"),
        F.expr("bool_and(l_quantity > 0)").alias("all_pos_qty"),
        F.expr("bool_or(l_tax > 0.07)").alias("any_hi_tax"),
        F.expr("every(l_extendedprice > 0)").alias("every_pos_price"),
    )


@register(
    "sql_group_by_all",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ALL
""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+ / DuckDB): group on every non-aggregate
    select item — the analyst shorthand both engines resolve to the same
    explicit grouping; plans identically to agg_groupby_hash."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql("""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem_gba GROUP BY ALL
""")
