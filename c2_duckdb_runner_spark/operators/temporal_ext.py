"""Round-3 temporal-correctness extensions.

Two shapes from the time-travel corner of the warehouse (reference reach:
the delegated SQL slot, ``main.cc:181-182``):

- point-in-time (versioned) lookup — "what was the dimension's value WHEN
  the fact happened": the query that makes SCD Type-2 tables useful, and
  the one that silently goes wrong as a plain join (latest-version leakage
  = train/serve skew in feature pipelines);
- survival / lifespan curve — the Kaplan–Meier-flavored retention view
  (what fraction of users remain active ≥ k days after first being seen).

Determinism: both are pure integer time arithmetic (epoch days/millis);
the point-in-time carry is a total-ordered window, not a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "join_point_in_time_version",
    oracle="""
WITH feed AS (
  SELECT o_custkey, o_orderstatus,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS ms, o_orderkey,
         LAG(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate NULLS FIRST, o_orderkey) AS prev
  FROM orders
),
versions AS (
  SELECT o_custkey AS k, o_orderstatus AS status, ms, o_orderkey AS vid
  FROM feed WHERE prev IS NULL OR prev <> o_orderstatus
),
probes AS (
  SELECT o_custkey AS k, o_orderkey AS probe_id,
         epoch_ms(CAST(o_orderdate AS TIMESTAMP)) + 43200000 AS pms
  FROM orders WHERE o_orderkey % 13 = 0
),
tagged AS (
  SELECT k, ms, 0 AS is_probe, vid AS id, status, NULL AS probe_id
  FROM versions
  UNION ALL
  SELECT k, pms AS ms, 1 AS is_probe, probe_id AS id, NULL AS status,
         probe_id
  FROM probes
),
carried AS (
  SELECT k, ms, is_probe, probe_id,
         last_value(status IGNORE NULLS)
           OVER (PARTITION BY k ORDER BY ms NULLS FIRST, is_probe, id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS status_at
  FROM tagged
)
SELECT CAST(probe_id AS BIGINT) AS probe_id, CAST(k AS BIGINT) AS custkey,
       CAST(ms AS BIGINT) AS probe_ms, status_at
FROM carried WHERE is_probe = 1
""",
)
def join_point_in_time_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME lookup against a versioned (SCD Type-2) dimension —
    "what was this customer's status at the moment of the probe": the
    temporal-correctness query behind feature-store training joins, where
    joining the LATEST version instead (the naive join) leaks the future
    into training data. Versions come from the same change feed
    cdc_scd2_merge builds; probes are mid-day timestamps so ties are
    unambiguous.

    Scale shape: no range join and no interval table — versions and
    probes UNION into one stream, ONE (key)-partitioned window carries
    the latest version attribute forward (IGNORE NULLS last_value), and
    probes read it off. One shuffle + one sort regardless of how many
    probes share a version — the same engine as join_asof, applied to
    the SCD use-case; at 100 TB the sort key is (entity, time), which is
    exactly how feature stores lay out their event logs."""
    o = load(spark, sf_dir, "orders")
    wfeed = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    feed = o.select(
        "o_custkey",
        "o_orderstatus",
        F.expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))").alias("ms"),
        "o_orderkey",
        F.lag("o_orderstatus").over(wfeed).alias("prev"),
    )
    versions = feed.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderstatus"))
    ).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        "ms",
        F.col("o_orderkey").alias("vid"),
    )
    probes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("probe_id"),
        (F.expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))") + 43200000).alias(
            "pms"
        ),
    )
    tagged = versions.select(
        "k",
        "ms",
        F.lit(0).alias("is_probe"),
        F.col("vid").alias("id"),
        "status",
        F.lit(None).cast("long").alias("probe_id"),
    ).unionByName(
        probes.select(
            "k",
            F.col("pms").alias("ms"),
            F.lit(1).alias("is_probe"),
            F.col("probe_id").alias("id"),
            F.lit(None).cast("string").alias("status"),
            "probe_id",
        )
    )
    wcarry = Window.partitionBy("k").orderBy("ms", "is_probe", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = tagged.select(
        "k",
        "ms",
        "is_probe",
        "probe_id",
        F.last("status", ignorenulls=True).over(wcarry).alias("status_at"),
    )
    return carried.filter(F.col("is_probe") == 1).select(
        F.col("probe_id").cast("bigint").alias("probe_id"),
        F.col("k").cast("bigint").alias("custkey"),
        F.col("ms").cast("bigint").alias("probe_ms"),
        "status_at",
    )


@register(
    "agg_survival_curve",
    oracle="""
WITH span AS (
  SELECT user_id,
         (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) // 86400000 AS life_days
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM span),
k AS (SELECT unnest(range(0, 30)) AS day_k),
surv AS (
  SELECT day_k, CAST(COUNT(*) AS BIGINT) AS n_surviving
  FROM k JOIN span ON span.life_days >= k.day_k
  GROUP BY day_k
)
SELECT CAST(day_k AS BIGINT) AS day_k, n_surviving,
       CAST(n_surviving * 1000000 // n_users AS BIGINT) AS surviving_ppm
FROM surv, n
""",
)
def agg_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival (lifespan) curve — for each day offset k, the fraction of
    users whose PURCHASE lifetime (first to last purchase) reaches ≥ k days: the engagement
    longevity view product analytics reads next to the weekly cohort
    matrix (retention_cohort_weekly answers "did they come back in week
    w"; this answers "how long do they live at all").

    Shape: one user-keyed reduce produces each user's integer lifespan in
    days; the 30-row day spine then counts survivors — implemented NOT as
    a spine⨝users theta join (which materializes 30·|users| rows) but as
    a per-user bounded explode of sequence(0, life_days) capped at 29:
    identical result, map-side fan-out ≤ 30, one (day_k) rollup. Survival
    is exact integer ppm."""
    span = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.expr(
                "(MAX(unix_millis(ts)) - MIN(unix_millis(ts))) div 86400000"
            ).alias("life_days")
        )
    )
    n = span.agg(F.count("*").cast("bigint").alias("n_users"))
    surv = (
        span.select(
            F.explode(
                F.expr("sequence(0, CAST(least(life_days, 29) AS INT))")
            ).alias("day_k")
        )
        .groupBy("day_k")
        .agg(F.count("*").cast("bigint").alias("n_surviving"))
    )
    return (
        surv.crossJoin(F.broadcast(n))
        .select(
            F.col("day_k").cast("bigint").alias("day_k"),
            "n_surviving",
            F.expr("CAST(n_surviving * 1000000 div n_users AS BIGINT)").alias(
                "surviving_ppm"
            ),
        )
    )
