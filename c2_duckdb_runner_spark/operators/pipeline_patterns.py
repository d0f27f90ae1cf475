"""Pipeline patterns: sessionization, latest-record compaction, calendar
spines, deterministic sampling, and the remaining ANSI aggregate families.

These are the everyday shapes of a large-scale (training-)data pipeline that
SURVEY.md §2 reaches only through the delegated SQL slot
(``main.cc:181-182``): turning an append-only event log into sessions and
current-state snapshots, zero-filling time series, carving reproducible
samples, and the ordered/positional/bitwise aggregates the earlier function
families skipped.

Scale notes (100 TB design point):
- Sessionization and latest-record both shuffle ONCE on the entity key and
  do all per-entity work inside that partition (window or agg) — the only
  layout a 1000-executor cluster can run them in. Latest-record uses the
  max-of-struct trick (one hash agg, partial+final, no per-key sort) rather
  than row_number-over-window, which must sort every partition.
- Deterministic sampling is a *predicate* (hash-prefix compare), so it
  pushes into the scan and composes with column pruning; never `TABLESAMPLE`
  or `rand()` when the sample must be reproducible across runs and engines.
- The calendar spine is generated from one aggregated row (2 values) and
  exploded — never materialize a driver-side date list and parallelize it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load

_GAP_MIN = 30  # session gap threshold, minutes


@register(
    "sessionize_batch",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
         CAST(value AS DECIMAL(18,6)) AS dval
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN ts_ms - LAG(ts_ms) OVER w > {_GAP_MIN} * 60 * 1000
                OR LAG(ts_ms) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM o
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
),
sess AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       CAST(SUM(dval) AS DOUBLE) AS total_value
FROM sess
GROUP BY user_id, session_seq
""",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions at
    >30-min gaps (lag → boundary flag → running sum = session id), then
    aggregate per session. One shuffle on user_id serves both windows and
    the final agg — Catalyst reuses the partitioning. Ties broken by
    event_id so the session assignment is a total order (hash-stable)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value").cast("decimal(18,6)").alias("dval"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    flagged = ev.withColumn(
        "is_start",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms").over(w) > _GAP_MIN * 60 * 1000)
            | F.lag("ts_ms").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
        F.sum("dval").cast("double").alias("total_value"),
    )


@register(
    "dedup_latest_by_key",
    oracle="""
SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, event_id,
       event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id
  ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) = 1
""",
)
def dedup_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (CDC/snapshot pattern): keep each
    user's most recent event. Implemented as max-of-struct — ONE hash
    aggregation with partial+final merge, no window sort: at 100 TB this is
    a single shuffle of pre-aggregated partials, while row_number() must
    shuffle and sort every raw row. (ts_ms, event_id) leads the struct so
    struct ordering == (latest ts, highest event_id); unique event_id makes
    the winner total-ordered, hence hash-stable."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.struct(
            F.unix_millis("ts").alias("ts_ms"),
            "event_id",
            "event_type",
            "value",
        ).alias("rec"),
    )
    top = ev.groupBy("user_id").agg(F.max("rec").alias("rec"))
    return top.select(
        "user_id", "rec.ts_ms", "rec.event_id", "rec.event_type", "rec.value"
    )


@register(
    "gen_series_calendar",
    oracle="""
WITH b AS (
  SELECT date_trunc('day', MIN(o_orderdate)) AS lo,
         date_trunc('day', MAX(o_orderdate)) AS hi
  FROM orders
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b
),
daily AS (
  SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT epoch_ms(spine.day) AS day_ms, COALESCE(n_orders, 0) AS n_orders
FROM spine LEFT JOIN daily ON spine.day = daily.day
""",
)
def gen_series_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + zero-fill: daily order counts with every
    day present, gaps as 0. The spine comes from exploding sequence(min,
    max, 1 day) over the single aggregated bounds row — generated
    executor-side from 2 values, no driver-side list. The spine is tiny at
    any SF (days, not rows) so it broadcasts into the left join."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(F.count("*").alias("n_orders"))
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            F.unix_millis("day").alias("day_ms"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "sample_deterministic",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
""",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample: md5(key) hex-prefix compare ('1a' = 26/256
    buckets). Unlike TABLESAMPLE/rand(), the sample is stable across runs,
    partitionings, AND engines (md5 is md5 everywhere) — the property a
    debugging/eval split needs. It's a pure row predicate: evaluates
    streaming in the scan stage, no shuffle, composes with pushdown of any
    other predicate."""
    orders = load(spark, sf_dir, "orders")
    return orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "agg_string_ordered",
    oracle="""
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n
FROM nation GROUP BY n_regionkey
""",
)
def agg_string_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg): collect_list → array_sort →
    array_join. Sorting inside the aggregate value (not a global ORDER BY)
    keeps the result deterministic under any partial-agg merge order —
    unordered string_agg/listagg is merge-order-dependent and would never
    hash-match across engines or runs."""
    nat = load(spark, sf_dir, "nation")
    return nat.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations"
        ),
        F.count("*").alias("n"),
    )


@register(
    "agg_median_mode",
    oracle="""
WITH freq AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
modes AS (
  SELECT l_returnflag, MIN(l_quantity) AS mode_qty
  FROM (SELECT *, RANK() OVER (PARTITION BY l_returnflag
                               ORDER BY c DESC) AS r FROM freq)
  WHERE r = 1 GROUP BY l_returnflag
)
SELECT m.l_returnflag,
       ROUND(median(CASE WHEN NOT isnan(l.l_quantity)
                         THEN l.l_quantity END), 6) AS median_qty,
       m.mode_qty
FROM lineitem l JOIN modes m USING (l_returnflag)
GROUP BY m.l_returnflag, m.mode_qty
""",
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + deterministic mode per group. Mode is computed from
    the (group, value) frequency table with min-value tie-break — native
    mode() picks an arbitrary winner on ties in both engines, which can
    never hash-match. Median is the exact interpolated 0.5-percentile in
    both engines. The frequency table is |distinct values| rows, so the
    rank window runs on the reduced aggregate, not the fact."""
    li = load(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("c").desc())
    modes = (
        freq.withColumn("r", F.rank().over(w))
        .filter(F.col("r") == 1)
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("mode_qty"))
    )
    # NaN pin (r11 hostile): Spark median ranks NaN highest, DuckDB's
    # ignores it — NaN leaves the ordered set on both sides
    med = li.groupBy("l_returnflag").agg(
        F.round(
            F.median(F.expr(
                "CASE WHEN NOT isnan(l_quantity) THEN l_quantity END"
            )),
            6,
        ).alias("median_qty")
    )
    return med.join(F.broadcast(modes), "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty"
    )


@register(
    "agg_regression_manual",
    oracle="""
WITH s AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
    AS intercept,
  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
""",
)
def agg_regression_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope/intercept/R² (regr_slope/intercept/r2 family)
    from exact decimal sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²).
    Native regr_* accumulates doubles whose partial-merge order varies run
    to run; decimal sums are associative and exact, so the derived
    statistics are bit-stable at any parallelism."""
    li = load(spark, sf_dir, "lineitem")
    d2 = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(d2("l_quantity")).cast("double").alias("sx"),
        F.sum(d2("l_extendedprice")).cast("double").alias("sy"),
        F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast(
                "decimal(28,4)"
            )
        )
        .cast("double")
        .alias("sxy"),
        F.sum(
            (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,4)")
        )
        .cast("double")
        .alias("sxx"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(28,4)"
            )
        )
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "upsert_merge_by_key",
    oracle="""
WITH base AS (
  SELECT event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms, value
  FROM events
),
updates AS (
  SELECT event_id, ts_ms + 3600000 AS ts_ms, value * 2 AS value
  FROM base WHERE event_id % 10 = 0
),
unioned AS (SELECT * FROM base UNION ALL SELECT * FROM updates)
SELECT event_id, ts_ms, value FROM unioned
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts_ms DESC NULLS LAST, value DESC NULLS LAST) = 1
""",
)
def upsert_merge_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/MERGE compaction without a table format: base ∪ updates →
    newest version per key wins. The synthetic update set (10% of events,
    ts+1h, value doubled) stands in for a CDC batch. Same max-of-struct
    single-agg shape as latest-record — the scalable way to express Delta's
    MERGE when all you have is files: one union (no shuffle) + one hash
    agg, versus a window sort over every version of every key. Update ts is
    strictly later than its base row, so the winner is total-ordered."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_millis("ts").alias("ts_ms"), "value"
    )
    updates = ev.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        (F.col("ts_ms") + 3600000).alias("ts_ms"),
        (F.col("value") * 2).alias("value"),
    )
    merged = (
        ev.unionByName(updates)
        .groupBy("event_id")
        .agg(F.max(F.struct("ts_ms", "value")).alias("r"))
    )
    return merged.select("event_id", "r.ts_ms", "r.value")


@register(
    "agg_time_weighted",
    oracle="""
WITH o AS (
  SELECT user_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
         CAST(value AS DECIMAL(18,6)) AS v,
         LEAD(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id
           ORDER BY epoch_ms(CAST(ts AS TIMESTAMP)), event_id) AS nxt_ms
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       ROUND(CAST(SUM(v * (nxt_ms - ts_ms)) AS DOUBLE)
             / CAST(SUM(nxt_ms - ts_ms) AS DOUBLE), 6) AS twa
FROM o
WHERE nxt_ms IS NOT NULL
GROUP BY user_id
HAVING SUM(nxt_ms - ts_ms) > 0
""",
)
def agg_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the hypertable/metrics pattern): each reading
    weighted by how long it was current (lead(ts) - ts), per user. Weights
    and values go through decimal so partial-agg merge order can't move the
    hash; the HAVING guard removes zero-duration users so the division is
    total under ANSI mode. One user_id shuffle serves the lead() window and
    the aggregate."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    with_next = ev.withColumn("nxt_ms", F.lead("ts_ms").over(w)).filter(
        F.col("nxt_ms").isNotNull()
    )
    return (
        with_next.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(F.col("v") * (F.col("nxt_ms") - F.col("ts_ms")))
            .cast("double")
            .alias("wsum"),
            F.sum(F.col("nxt_ms") - F.col("ts_ms")).cast("double").alias("dt"),
        )
        .filter(F.col("dt") > 0)
        .select(
            "user_id",
            "n_intervals",
            F.round(F.col("wsum") / F.col("dt"), 6).alias("twa"),
        )
    )


@register(
    "agg_bitwise",
    oracle="""
SELECT o_orderstatus,
       bit_and(o_orderkey % 1024) AS b_and,
       bit_or(o_orderkey % 1024) AS b_or,
       bit_xor(o_orderkey % 1024) AS b_xor
FROM orders GROUP BY o_orderstatus
""",
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates (flag-set merging). All three are
    commutative + associative, so partial aggregation merges in any order —
    safe at any parallelism with no decimal detour."""
    orders = load(spark, sf_dir, "orders").withColumn(
        "k", F.col("o_orderkey") % 1024
    )
    return orders.groupBy("o_orderstatus").agg(
        F.bit_and("k").alias("b_and"),
        F.bit_or("k").alias("b_or"),
        F.bit_xor("k").alias("b_xor"),
    )


# NOTE: registered from this module (imported after the window/sort
# modules) so the driver's first-50 registration sample stays byte-stable
# across rounds; the operator itself is an aggregate-family query.
@register(
    "agg_mode_exact",
    oracle="""
WITH c AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
  FROM orders WHERE o_orderpriority IS NOT NULL
  GROUP BY o_custkey, o_orderpriority
)
SELECT o_custkey,
       (MAX({'c': cnt, 'p': o_orderpriority})).p AS mode_priority,
       CAST(MAX(cnt) AS BIGINT) AS mode_count
FROM c GROUP BY o_custkey
""",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent value) with a deterministic
    tie-break: two chained hash aggregates — (group, value) counts, then
    max-of-(count, value)-struct per group. No window pass, both shuffles
    map-side combinable; ties resolve to the lexicographically LARGEST
    value at equal count in both engines (struct comparison orders by
    count, then value)."""
    # NULL values are not mode candidates (r11 hostile pin: DuckDB's
    # struct-MAX ranks a NULL member LARGEST, Spark smallest — excluding
    # NULL is the only faithful shared semantics)
    c = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .groupBy("o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    return c.groupBy("o_custkey").agg(
        F.max(
            F.struct(F.col("cnt").alias("c"), F.col("o_orderpriority").alias("p"))
        )["p"].alias("mode_priority"),
        F.max("cnt").alias("mode_count"),
    )


@register(
    "pipeline_observe_metrics",
    oracle="""
WITH src AS (SELECT * FROM lineitem),
kept AS (
  SELECT * FROM src
  WHERE l_quantity >= 5 AND l_discount BETWEEN 0.01 AND 0.09
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_kept,
       CAST((SELECT COUNT(*) FROM src) AS BIGINT) AS n_scanned,
       CAST((SELECT COUNT(*) FROM src) -
            (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_filtered
FROM kept GROUP BY l_returnflag
""",
)
def pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-flight pipeline metrics via the Observation API (Spark 3.3+):
    a quality gate that REPORTS what it dropped without a second scan.
    ``df.observe`` attaches accumulator-backed aggregates (rows scanned,
    rows passing the gate) to the running query itself — at 100 TB this is
    how a curation step exposes its filter rates to the orchestrator for
    free, where a separate audit query would re-read the input. The
    observed counters are then joined onto the output as columns so the
    differential can hash-check them (the oracle recomputes the same
    counts with scalar subqueries — semantically identical, but costs a
    second pass, which is exactly the point of observe()).

    No silent drops: n_scanned − n_kept_total = n_filtered is carried on
    every row, so a pushdown or predicate regression shows up as a value
    change, not just a row-count change."""
    from pyspark.sql import Observation

    src = load(spark, sf_dir, "lineitem")
    obs = Observation("gate")
    gated = src.observe(
        obs, F.count(F.lit(1)).alias("n_scanned")
    ).filter(
        (F.col("l_quantity") >= 5)
        & (F.col("l_discount").between(0.01, 0.09))
    )
    out = gated.groupBy("l_returnflag").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("qty_kept"),
    )
    # materialize once so the observation fires; the aggregate is tiny
    rows = out.collect()
    n_scanned = obs.get["n_scanned"]
    kept_total = sum(r["n_kept"] for r in rows)
    result = spark.createDataFrame(rows, out.schema)
    return result.withColumn(
        "n_scanned", F.lit(n_scanned).cast("bigint")
    ).withColumn(
        "n_filtered", F.lit(n_scanned - kept_total).cast("bigint")
    )


@register(
    "window_session_builtin",
    oracle="""
WITH e AS (
  SELECT user_id, event_id,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
         CAST(value AS DECIMAL(18,6)) AS dval
  FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN ms - LAG(ms) OVER w >= 1800000 OR
                   LAG(ms) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
),
sess AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       CAST(MIN(ms) AS BIGINT) AS start_ms,
       CAST(MAX(ms) AS BIGINT) AS last_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(dval) AS DOUBLE) AS total_value
FROM sess GROUP BY user_id, session_seq
""",
)
def window_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILT-IN session windows in batch mode: ``groupBy(session_window(ts,
    '30 minutes'), user_id)`` — the same dynamic-gap windows the streaming
    query uses (stream_session_window), applied to a static table. One
    aggregate, no window-function pass: Spark sorts within the user_id
    shuffle and merges adjacent events whose gap < 30 min into one window
    (an event at exactly +30 min starts a NEW session — the window is
    half-open, which the oracle's >= boundary mirrors; the hash would
    catch an off-by-one on the boundary). The manual lag/running-sum
    formulation (sessionize_batch) exists alongside to show what the
    built-in replaces."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("decimal(18,6)").alias("dval"),
    )
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_millis("ts")).alias("start_ms"),
            F.max(F.unix_millis("ts")).alias("last_ms"),
            F.sum("dval").cast("double").alias("total_value"),
        )
        .select(
            "user_id", "start_ms", "last_ms", "n_events", "total_value"
        )
    )
