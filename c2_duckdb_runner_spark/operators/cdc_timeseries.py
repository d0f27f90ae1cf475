"""CDC / profiling / time-series operators: warehouse-maintenance patterns.

The reference reaches these only through its delegated SQL slot
(``main.cc:181-182``). This module adds the table-maintenance trio every
production lakehouse runs: SCD Type-2 dimension builds from a change feed,
single-pass column profiling, and gap-filled time-series interpolation.

Determinism: interpolation is pure int64 arithmetic (value micros, hour
indexes, integer division) — no float folds, so DuckDB replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "cdc_scd2_merge",
    oracle="""
WITH feed AS (
  SELECT o_custkey, o_orderstatus,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS ms,
         o_orderkey,
         LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
), changes AS (
  SELECT o_custkey, o_orderstatus, ms, o_orderkey FROM feed
  WHERE prev IS NULL OR prev <> o_orderstatus
)
SELECT o_custkey, o_orderstatus AS status,
       ms AS eff_from_ms,
       LEAD(ms) OVER (PARTITION BY o_custkey ORDER BY ms, o_orderkey)
         AS eff_to_ms,
       (LEAD(ms) OVER (PARTITION BY o_custkey ORDER BY ms, o_orderkey)
         IS NULL) AS is_current
FROM changes
""",
)
def cdc_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: treat each customer's order sequence as
    an attribute-change feed (status transitions), keep only genuine
    changes (lag-based change detection), then close each version with the
    next change's timestamp (lead) and flag the open one as current.

    Both window passes partition on the same key, so Catalyst plans ONE
    o_custkey shuffle and reuses the sort — the scalable shape for
    billion-row change feeds (state per key is the window frame, never
    materialized)."""
    w_feed = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    feed = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderstatus",
            # o_orderdate reads as TIMESTAMP_NTZ; session TZ is pinned UTC,
            # so the cast keeps wall-clock and matches DuckDB's epoch_ms
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ms"),
            "o_orderdate",
            "o_orderkey",
        )
        .withColumn("prev", F.lag("o_orderstatus").over(w_feed))
    )
    changes = feed.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus"))
    )
    # ms alone is not a total order: two same-day changes (distinct orders,
    # alternating status) tie on ms, and engines may chain the versions in
    # either order. o_orderkey — the change feed's own sequence column —
    # breaks the tie identically everywhere (caught at sf0.1).
    w_ver = Window.partitionBy("o_custkey").orderBy("ms", "o_orderkey")
    eff_to = F.lead("ms").over(w_ver)
    return changes.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("ms").alias("eff_from_ms"),
        eff_to.alias("eff_to_ms"),
        eff_to.isNull().alias("is_current"),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


@register(
    "profile_table_summary",
    oracle=" UNION ALL ".join(
        f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       MIN({c}) AS min_val, MAX({c}) AS max_val
FROM lineitem"""
        for c in _PROFILE_COLS
    ),
)
def profile_table_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the stats pass behind OPTIMIZE/ANALYZE and data
    catalogs): null count, exact distinct count, min, max per column —
    one row per profiled column.

    All columns profile in a SINGLE scan: one wide aggregate row, then a
    stack() unpivot of the constants. min/max/distinct involve no float
    arithmetic (equality and ordering only), so doubles compare exactly
    across engines."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
            F.countDistinct(c).alias(f"{c}_distinct"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_nulls, {c}_distinct, {c}_min, {c}_max" for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)"
    )


_HOUR_MS = 3_600_000


@register(
    "ts_gap_fill_interpolate",
    oracle=f"""
WITH hourly AS (
  SELECT user_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) // {_HOUR_MS} AS h,
         CAST(SUM(CAST(ROUND(CAST(value AS DECIMAL(18,6)) * 1000000)
                       AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT user_id, unnest(range(min(h), max(h) + 1)) AS h
  FROM hourly GROUP BY user_id
), joined AS (
  SELECT s.user_id, s.h, hv.v FROM spine s
  LEFT JOIN hourly hv ON hv.user_id = s.user_id AND hv.h = s.h
), bracketed AS (
  SELECT user_id, h, v,
         LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
           OVER w_prev AS ph,
         FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
           OVER w_next AS nh
  FROM joined
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w_next AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, h,
       CASE WHEN v IS NOT NULL THEN v
            ELSE pv + ((nv - pv) * (h - ph)) // (nh - ph) END
         AS filled_micros,
       (v IS NOT NULL) AS was_observed
FROM bracketed
""",
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with linear interpolation: bucket events to
    per-user hourly sums, generate the dense hour spine per user
    (sequence + explode), and fill missing hours by interpolating between
    the bracketing observations (last/first non-null window).

    Every quantity is int64 — value micros, hour indexes, integer-division
    interpolation — so the fill is exact and engine-agnostic. The spine
    join and both window passes share the user_id partitioning: Catalyst
    plans one shuffle for the windows and a co-partitioned join, and state
    never exceeds one user's span. The classic sensor/metrics densify
    step at warehouse scale."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "user_id",
            F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
            (F.col("value").cast("decimal(18,6)") * 1000000)
            .cast("long")
            .alias("micros"),
        )
        .groupBy("user_id", "h")
        .agg(F.sum("micros").alias("v"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    b = joined.select(
        "user_id",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("nh"),
    )
    interp = F.col("pv") + F.expr("((nv - pv) * (h - ph)) div (nh - ph)")
    return b.select(
        "user_id",
        "h",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias(
            "filled_micros"
        ),
        F.col("v").isNotNull().alias("was_observed"),
    )
