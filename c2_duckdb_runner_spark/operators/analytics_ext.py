"""Extended analytics: pivot, time-grain rollup, exact correlation,
time-range window frames.

Delegated SQL surface (``main.cc:181-182``); these four cover the analytical
shapes SURVEY.md §2 reaches only implicitly:

- pivot            : wide-form conditional aggregation (one shuffle, the
                     pivot columns are pinned so the schema is static —
                     never let pivot() infer values at 100 TB: that's an
                     extra distinct-scan job).
- time rollup      : day+hour aggregates in ONE pass via GROUPING SETS over
                     date_trunc exprs — the hypertable/continuous-aggregate
                     pattern (n grains = 1 shuffle, not n jobs).
- exact correlation: corr from exact decimal sufficient statistics
                     (Σx, Σy, Σxy, Σx², Σy², n) — deterministic under any
                     partial-aggregation order, unlike native corr() over
                     doubles; merges associatively at any scale.
- time-range frame : RANGE window keyed on epoch millis — trailing-hour
                     sums per user; peers-included semantics make ties
                     deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "agg_pivot",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN l_linestatus = 'F' "
        "  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f, "
        "CAST(SUM(CASE WHEN l_linestatus = 'O' "
        "  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns. Values are PINNED (['F','O']) —
    letting pivot() discover them costs a full distinct pass first, and an
    unpinned output schema can't be a stable contract anyway."""
    li = load(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return wide.select(
        "l_returnflag",
        F.col("F").alias("qty_f"),
        F.col("O").alias("qty_o"),
    )


@register(
    "agg_time_rollup",
    oracle="""
WITH e AS (
  SELECT epoch_ms(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day_ms,
         epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_ms,
         value
  FROM events
)
SELECT day_ms, hour_ms,
       CASE WHEN hour_ms IS NULL THEN 'day' ELSE 'hour' END AS grain,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM e
GROUP BY GROUPING SETS ((day_ms), (day_ms, hour_ms))
""",
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: per-day AND per-hour aggregates in one
    GROUPING SETS pass — one shuffle serves every grain, the pattern a
    100 TB events table wants instead of one job per granularity."""
    ev = load(spark, sf_dir, "events").select(
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"),
        F.unix_millis(F.date_trunc("hour", "ts")).alias("hour_ms"),
        "value",
    )
    ev.createOrReplaceTempView("c2s_time_rollup_src")
    return spark.sql(
        """
        SELECT day_ms, hour_ms,
               CASE WHEN hour_ms IS NULL THEN 'day' ELSE 'hour' END AS grain,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        FROM c2s_time_rollup_src
        GROUP BY GROUPING SETS ((day_ms), (day_ms, hour_ms))
        """
    )


@register(
    "agg_corr_manual",
    oracle=(
        "WITH s AS ("
        "  SELECT l_returnflag, COUNT(*) AS n, "
        "  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx, "
        "  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy, "
        "  CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy, "
        "  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx, "
        "  CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy "
        "  FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_returnflag, n, "
        "ROUND((n * sxy - sx * sy) / "
        " (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price "
        "FROM s"
    ),
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal sufficient statistics —
    deterministic under any partial-agg merge order (native corr() over
    doubles is not), and the statistics merge associatively at any scale."""
    li = load(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((q * p).cast("decimal(28,4)")).cast("double").alias("sxy"),
        F.sum((q * q).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(28,4)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    )
    return agg.select(
        "l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price")
    )


@register(
    "window_range_interval",
    oracle=(
        "SELECT event_id, user_id, "
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER "
        " (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) "
        "  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS trailing_hour_total "
        "FROM events"
    ),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour running total per user via a RANGE frame over epoch
    millis. RANGE (value-based) vs ROWS matters twice: the frame tracks
    event *time*, and tied timestamps are peers — included together — so the
    result is order-deterministic without a tiebreaker."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_ms", F.unix_millis("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-3600000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_hour_total"),
    )


@register(
    "agg_skew_kurt_manual",
    oracle=(
        "WITH s AS ("
        "  SELECT l_returnflag, COUNT(*) AS n, "
        "  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1, "
        "  CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS s2, "
        "  CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(28,4))) "
        "       AS DOUBLE) AS s3, "
        "  CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity "
        "       AS DECIMAL(28,4))) AS DOUBLE) AS s4 "
        "  FROM lineitem GROUP BY l_returnflag), "
        "m AS (SELECT l_returnflag, n, s1 / n AS mu, "
        "      s2 / n - (s1 / n) * (s1 / n) AS m2, "
        "      s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3, "
        "      s4 / n - 4 * (s1 / n) * s3 / n "
        "        + 6 * (s1 / n) * (s1 / n) * s2 / n "
        "        - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4 "
        "      FROM s) "
        "SELECT l_returnflag, n, ROUND(mu, 6) AS mean_qty, "
        "ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness, "
        "ROUND(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis "
        "FROM m"
    ),
)
def agg_skew_kurt_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis from exact decimal power
    sums (Σx..Σx⁴) — the same sufficient-statistics discipline as
    agg_corr_manual: partials merge associatively at any scale, and the
    float division/sqrt happens once on identical exact inputs in both
    engines (native skewness()/kurtosis() over doubles is merge-order
    dependent and engine-variant). The identical formula is spelled out
    on both sides; derived floats rounded to 6."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("s1"),
        F.sum((q * q).cast("decimal(28,4)")).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(28,4)")).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast("decimal(28,4)")).cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * F.col("s2") / n + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * F.col("s3") / n
        + 6 * mu * mu * F.col("s2") / n
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )
