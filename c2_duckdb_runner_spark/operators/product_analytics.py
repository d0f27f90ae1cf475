"""Product-analytics composites over the events stream: funnel, cohorts,
incremental aggregate maintenance, tolerance as-of matching.

These are the event-pipeline counterparts of the TPC-H-shaped composites in
``composite.py`` — the queries a telemetry/training-data warehouse actually
serves. The reference reaches them only through its delegated SQL slot
(``main.cc:181-182``).

Determinism: all times are integer epoch millis, durations are int64
subtractions, and any float metric is summed as DECIMAL micros — every
query replays exactly in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

_DUCK_MS = "epoch_ms(CAST(ts AS TIMESTAMP))"


@register(
    "funnel_view_click_purchase",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN {_DUCK_MS} END) AS t1,
         list({_DUCK_MS}) FILTER (WHERE event_type = 'click') AS clicks,
         list({_DUCK_MS}) FILTER (WHERE event_type = 'purchase') AS purchases
  FROM events GROUP BY user_id
), staged AS (
  SELECT user_id, t1,
         list_min(list_filter(clicks, c -> c >= t1)) AS t2,
         list_min(list_filter(purchases,
                              p -> p >= list_min(list_filter(clicks, c -> c >= t1))))
           AS t3
  FROM per_user
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(t1) AS BIGINT) AS n_view,
       CAST(COUNT(t2) AS BIGINT) AS n_click_after_view,
       CAST(COUNT(t3) AS BIGINT) AS n_purchase_after_click,
       CAST(SUM(CASE WHEN t3 IS NOT NULL THEN t3 - t1 END) AS BIGINT)
         AS total_convert_ms
FROM staged
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each stage must happen at or
    after the previous one. ONE groupBy(user_id) collects per-type
    timestamp arrays; the stage chaining (min over filtered arrays) is
    array-lambda work inside the aggregate's projection — no second
    shuffle, no self-joins, no window cascade. That array-per-group shape
    is the scalable funnel: state per user is its own event list, and the
    final rollup is a singleton reduce."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ms"))).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ms"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ms"))
        ).alias("purchases"),
    )
    staged = per_user.select(
        "user_id",
        "t1",
        "purchases",
        F.expr("array_min(filter(clicks, c -> c >= t1))").alias("t2"),
    ).withColumn("t3", F.expr("array_min(filter(purchases, p -> p >= t2))"))
    return staged.agg(
        F.count("*").alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click_after_view"),
        F.count("t3").alias("n_purchase_after_click"),
        F.sum(F.when(F.col("t3").isNotNull(), F.col("t3") - F.col("t1")))
        .cast("bigint")
        .alias("total_convert_ms"),
    )


_WEEK_MS = 7 * 24 * 3_600_000


@register(
    "retention_cohort_weekly",
    oracle=f"""
WITH e AS (
  SELECT user_id, {_DUCK_MS} // {_WEEK_MS} AS wk FROM events
), cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id
)
SELECT c.cohort_wk, e.wk - c.cohort_wk AS offset_wk,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM e JOIN cohort c USING (user_id)
GROUP BY 1, 2
""",
)
def retention_cohort_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    per week offset — the triangle matrix behind every retention chart.
    The cohort table is one row per user (the first shuffle's output), so
    the join back to events is keyed on user_id and the final distinct-
    count agg reduces on (cohort, offset). Three shuffles total, each on
    a key whose cardinality shrinks monotonically."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_millis(ts) div {_WEEK_MS}").alias("wk")
    )
    cohort = e.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        e.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "incremental_agg_merge",
    oracle="""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) * 1000000) AS BIGINT)
         AS total_micros
FROM events GROUP BY event_type
""",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the month's events arrive as two
    increments (days 1-14, 15+), each reduced to a partial-state table
    (count + exact micros sum per type); the serving table is the MERGE of
    partials — never a re-scan of history. Equality with the full-scan
    oracle is the correctness statement of incremental view maintenance:
    the aggregate state is commutative and associative, so partials merge
    to the same result in any arrival order. At 100 TB this is the
    difference between reprocessing a day and reprocessing a lake."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        (F.col("value").cast("decimal(18,6)") * 1000000)
        .cast("long")
        .alias("micros"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("micros").alias("total_micros")
        )

    inc1 = partial(ev.filter(F.col("day") <= 14))
    inc2 = partial(ev.filter(F.col("day") >= 15))
    return (
        inc1.unionByName(inc2)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("total_micros").alias("total_micros"),
        )
    )


_TOL_MS = 3_600_000


@register(
    "join_asof_tolerance",
    oracle=f"""
WITH tagged AS (
  SELECT user_id, event_id, {_DUCK_MS} AS ms,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
  FROM events WHERE event_type IN ('click', 'purchase')
), carried AS (
  SELECT user_id, event_id, ms, kind,
         LAST_VALUE(CASE WHEN kind = 0 THEN ms END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ms NULLS FIRST, kind, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_ms
  FROM tagged
)
SELECT event_id AS purchase_id, user_id, ms AS purchase_ms,
       CASE WHEN last_click_ms >= ms - {_TOL_MS} THEN last_click_ms END
         AS click_ms,
       (last_click_ms IS NOT NULL AND last_click_ms >= ms - {_TOL_MS})
         AS attributed
FROM carried WHERE kind = 1
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH tolerance: each purchase matches the latest click by
    the same user at or before it, but only within a 1-hour attribution
    window — stale matches return NULL instead of an arbitrarily old row
    (the gap join_asof can't express). Same carry-forward formulation as
    join_asof: union both sides, one user_id window pass, filter to the
    probe side — one shuffle, state bounded by one user's history. Ties
    at the same millisecond order click-before-purchase, so a same-ms
    click attributes."""
    ev = load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ms"),
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_click_ms",
        F.last(F.when(F.col("kind") == 0, F.col("ms")), ignorenulls=True).over(w),
    )
    in_tol = F.col("last_click_ms") >= F.col("ms") - _TOL_MS
    return carried.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ms").alias("purchase_ms"),
        F.when(in_tol, F.col("last_click_ms")).alias("click_ms"),
        (F.col("last_click_ms").isNotNull() & in_tol).alias("attributed"),
    )


@register(
    "join_asof_forward",
    # NULL pin (r11 hostile): same discipline as join_asof — NULL ts/user
    # never matches; DuckDB's ASOF operator would otherwise sort NULLs
    # into the match order
    oracle=(
        "SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS purchase_ms, "
        "epoch_ms(c.ts) AS next_click_ms, "
        "epoch_ms(c.ts) - epoch_ms(p.ts) AS gap_ms FROM "
        "(SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events "
        " WHERE event_type = 'purchase' AND ts IS NOT NULL "
        " AND user_id IS NOT NULL) p "
        "ASOF LEFT JOIN "
        "(SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events "
        " WHERE event_type = 'click' AND ts IS NOT NULL "
        " AND user_id IS NOT NULL) c "
        "ON p.user_id = c.user_id AND p.ts <= c.ts "
        "UNION ALL "
        "SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)), "
        "CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM events "
        "WHERE event_type = 'purchase' AND (ts IS NULL OR user_id IS NULL)"
    ),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every purchase, the user's next click at or
    after it (time-to-next-engagement — the funnel-latency twin of the
    backward ``join_asof``). Same 100 TB-safe composition: union both sides
    tagged, ONE window pass per user ordered by (ts, side) carrying the
    nearest following click time backward with first_value(ignorenulls)
    over a current-row→following frame. Clicks sort AFTER purchases at
    identical ts (side 0 < 1), matching the oracle's inclusive ``<=``.
    Only the click TIME is taken, so same-ts click ties cannot produce
    nondeterminism. DuckDB's native forward ASOF is the oracle."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(
        (F.col("event_type") == "click")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select("user_id", "ts")
    tagged = purchases.select(
        "user_id", "ts", F.lit(0).alias("side"), "event_id",
        F.lit(None).cast("timestamp").alias("cts"),
    ).unionByName(
        clicks.select(
            "user_id", "ts", F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("ts").alias("cts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    joined = tagged.withColumn(
        "next_click", F.first("cts", ignorenulls=True).over(w)
    )
    matchable = F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    return joined.filter(F.col("side") == 0).select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("purchase_ms"),
        F.when(matchable, F.unix_millis("next_click"))
        .alias("next_click_ms"),
        F.when(
            matchable, F.unix_millis("next_click") - F.unix_millis("ts")
        ).alias("gap_ms"),
    )


@register(
    "window_gaps_islands",
    oracle="""
WITH hrs AS (
  SELECT DISTINCT user_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS h
  FROM events
),
tagged AS (
  SELECT user_id, h,
         h - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY h) AS grp
  FROM hrs
)
SELECT user_id,
       CAST(MIN(h) AS BIGINT) AS island_start_h,
       CAST(MAX(h) AS BIGINT) AS island_end_h,
       CAST(COUNT(*) AS BIGINT) AS n_hours
FROM tagged GROUP BY user_id, grp
""",
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active hours per user
    (the segment-detection dual of gap-based sessionization, which keys on
    the gaps instead). The classic h − row_number() trick: within a user,
    consecutive hours share a constant difference from their rank, so one
    window pass + one grouped agg finds every island — no self-join, no
    iteration. Both shuffles key on user_id; at 100 TB the distinct, the
    window, and the final group-by all ride the same hash partitioning, so
    AQE/exchange-reuse keeps it at effectively one physical shuffle."""
    hrs = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_millis(ts) div 3600000").alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("h")
    tagged = hrs.withColumn("grp", F.col("h") - F.row_number().over(w))
    return tagged.groupBy("user_id", "grp").agg(
        F.min("h").cast("bigint").alias("island_start_h"),
        F.max("h").cast("bigint").alias("island_end_h"),
        F.count("*").alias("n_hours"),
    ).drop("grp")
