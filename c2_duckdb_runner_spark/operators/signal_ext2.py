"""Round-3 final signal extensions: peak detection, transition matrices.

- local-maxima peak detection over the hourly series (the alert shape
  "traffic peaked at 14:00", distinct from threshold anomalies);
- Markov transition matrix over user event sequences (the session-flow
  model product analytics fits: P(next event type | current)).

Determinism: both are integers end-to-end (counts, lag/lead comparisons,
row-normalized ppm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "window_peak_detection",
    oracle="""
WITH c AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS h, COUNT(*) AS c
  FROM events GROUP BY event_type, h
),
w AS (
  SELECT event_type, h, c,
         LAG(c) OVER (PARTITION BY event_type ORDER BY h) AS prev,
         LEAD(c) OVER (PARTITION BY event_type ORDER BY h) AS next
  FROM c
)
SELECT event_type, CAST(h AS BIGINT) AS peak_hour, CAST(c AS BIGINT) AS n,
       CAST(prev AS BIGINT) AS prev_n, CAST(next AS BIGINT) AS next_n
FROM w
WHERE prev IS NOT NULL AND next IS NOT NULL AND c > prev AND c > next
""",
)
def window_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maxima peak detection — "traffic peaked at 14:00": an hour
    strictly above both neighbors. The alerting complement to
    ts_anomaly_zscore (a peak need not be an outlier; an outlier need not
    be a peak — dashboards want both). Interior strict maxima only, so
    the verdict is total (no boundary half-peaks, no ties double-firing).

    One (type, hour) count reduce, ONE window pass computing lag and lead
    in the same sort — per-type series is time-bounded, so window state
    is per-group. Pure integer comparisons."""
    c = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_millis(ts) div 3600000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    x = c.select(
        "event_type",
        "h",
        "c",
        F.lag("c").over(w).alias("prev"),
        F.lead("c").over(w).alias("next"),
    )
    return x.filter(
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (F.col("c") > F.col("prev"))
        & (F.col("c") > F.col("next"))
    ).select(
        "event_type",
        F.col("h").cast("bigint").alias("peak_hour"),
        F.col("c").cast("bigint").alias("n"),
        F.col("prev").cast("bigint").alias("prev_n"),
        F.col("next").cast("bigint").alias("next_n"),
    )


@register(
    "agg_markov_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY event_type, nxt
),
tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total FROM c
  GROUP BY from_type
)
SELECT c.from_type AS from_type, to_type, CAST(n AS BIGINT) AS n,
       row_total,
       CAST(n * 1000000 // row_total AS BIGINT) AS p_ppm
FROM c JOIN tot ON tot.from_type = c.from_type
""",
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over user event sequences — the
    session-flow model product analytics fits (P(next event | current)):
    which screens lead where, where funnels leak, what a bot's transition
    signature looks like. Row-normalized to exact integer ppm.

    Shape: ONE user-keyed window pass pairs each event with its successor
    ((ts, event_id) total order — no self-join of events to events), a
    |types|² count reduce, and the row totals re-enter as a broadcast
    |types|-row table. At 100 TB the matrix is still |types|² rows —
    the reduce-to-tiny shape that makes this cheap at any scale."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lead("event_type").over(w).alias("nxt"),
    )
    c = (
        s.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("nxt").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("row_total"))
    return (
        c.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            "row_total",
            F.expr("CAST(n * 1000000 div row_total AS BIGINT)").alias("p_ppm"),
        )
    )
