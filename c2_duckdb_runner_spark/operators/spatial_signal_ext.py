"""Round-3 spatial + signal-processing extensions.

Two operator families the engine did not yet cover, both reference-reachable
only through the delegated SQL slot (``main.cc:181-182``):

- CUSUM changepoint detection over event telemetry — the sequential-
  analysis primitive behind drift monitors (which hour did the behavior
  shift?), distinct from point anomalies (ts_anomaly_zscore flags spikes;
  CUSUM localizes sustained level shifts);
- grid-bucketed spatial neighbor join — the geohash/bucket pattern for
  "all pairs within distance r" without a cross product, the spatial twin
  of the LSH band join.

Determinism: CUSUM is kept in scaled integers (deviations multiplied by n
instead of dividing the mean), the spatial distance test compares squared
integer distances — no float appears anywhere in either operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load


@register(
    "ts_changepoint_cusum",
    oracle="""
WITH c AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS h, COUNT(*) AS c
  FROM events GROUP BY event_type, h
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS tot
  FROM c GROUP BY event_type
),
cu AS (
  SELECT c.event_type AS event_type, h, n,
         SUM(c * n - tot) OVER (PARTITION BY c.event_type
                                ORDER BY h
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cusum_n
  FROM c JOIN s ON s.event_type = c.event_type
)
SELECT event_type, CAST(h AS BIGINT) AS cp_hour,
       CAST(cusum_n AS BIGINT) AS cusum_scaled,
       CAST(n AS BIGINT) AS n_hours
FROM (
  SELECT event_type, h, n, cusum_n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(cusum_n) DESC, h ASC) AS rn
  FROM cu
) WHERE rn = 1
""",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint localization — where ts_anomaly_zscore answers
    "which hour spiked?", CUSUM answers "when did the level SHIFT?": the
    running sum of deviations from the series mean peaks in magnitude at
    the most likely changepoint (the classic Page/Pettitt estimator).
    Emits, per event type, the argmax-|CUSUM| hour and its statistic.

    Integer discipline: deviations are scaled by n (c·n − T) instead of
    subtracting the fractional mean, so the running sum is exact int64 and
    both engines agree without an epsilon. Shape: one (type, hour) count
    reduce; the per-type (n, T) table broadcasts back; ONE window pass
    (partition type, order hour) computes the running sum — the per-type
    series is time-bounded (744 rows/month), so window state is per-group,
    never corpus-sized; the argmax is a second tiny window over the same
    partitioning (Catalyst reuses the sort)."""
    c = (
        load(spark, sf_dir, "events")
        .select("event_type", F.expr("unix_millis(ts) div 3600000").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("c"))
    )
    s = c.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("tot"),
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = (
        c.join(F.broadcast(s), "event_type")
        .withColumn(
            "cusum_n",
            F.sum(F.col("c") * F.col("n") - F.col("tot")).over(wrun),
        )
    )
    wpick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum_n")).desc(), F.col("h").asc()
    )
    return (
        cu.withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("h").cast("bigint").alias("cp_hour"),
            F.col("cusum_n").cast("bigint").alias("cusum_scaled"),
            F.col("n").cast("bigint").alias("n_hours"),
        )
    )


# Deterministic synthetic coordinates (micro-units) — fixture-by-
# construction, the fn_url_parse discipline. md5-derived (the repo's
# standard cross-engine integer hash: Spark conv(hex,16,10) ≙ DuckDB
# CAST('0x'||hex AS BIGINT)) so the scatter is uniform, not the lattice a
# linear-congruential multiplier would give (which leaves small fixtures
# with zero close pairs).
_PT_SPARK_X = (
    "CAST(conv(substring(md5('px:' || CAST(c_custkey AS STRING)), 1, 8), "
    "16, 10) AS BIGINT) % 100000 AS x"
)
_PT_SPARK_Y = (
    "CAST(conv(substring(md5('py:' || CAST(c_custkey AS STRING)), 1, 8), "
    "16, 10) AS BIGINT) % 100000 AS y"
)
_PT_DUCK = (
    "CAST(('0x' || substring(md5('px:' || CAST(c_custkey AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 100000 AS x, "
    "CAST(('0x' || substring(md5('py:' || CAST(c_custkey AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 100000 AS y"
)
_R2 = 2000 * 2000  # neighbor radius^2, integer (cell size = radius)


@register(
    "join_spatial_grid_neighbors",
    oracle=f"""
WITH p AS (
  SELECT c_custkey AS k, {_PT_DUCK} FROM customer
),
pts AS (SELECT k, x, y, x // 2000 AS cx, y // 2000 AS cy FROM p),
probe AS (
  SELECT k, x, y, cx + dx.dx AS pcx, cy + dy.dy AS pcy
  FROM pts
  CROSS JOIN (SELECT unnest(range(-1, 2)) AS dx) dx
  CROSS JOIN (SELECT unnest(range(-1, 2)) AS dy) dy
),
pairs AS (
  SELECT b.cx AS cx, b.cy AS cy,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM probe a JOIN pts b ON a.pcx = b.cx AND a.pcy = b.cy
  WHERE a.k < b.k
    AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R2}
)
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(COUNT(*) AS BIGINT) AS n_close_pairs,
       CAST(MIN(d2) AS BIGINT) AS min_d2
FROM pairs GROUP BY cx, cy
""",
)
def join_spatial_grid_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial neighbor join — all point pairs within radius
    r, WITHOUT a cross product: bucket the plane into r-sized grid cells (2000 micro-units),
    replicate each point into its 3×3 neighbor cells (a bounded 9× map-side
    fan-out), equi-join probes against home cells, then apply the exact
    distance test. The geohash/S2 pattern every geo pipeline uses, and
    structurally the spatial twin of the MinHash band join (coarse bucket
    equi-join + exact verify). Reported per cell: close-pair count and the
    minimum squared distance.

    Exactly-once emission needs no distinct: the probe→home join produces
    each unordered pair as two ORDERED rows (a probing b's cell, b probing
    a's), and the a.k < b.k filter keeps exactly one. Cell size = radius
    guarantees any within-r pair shares a 3×3 neighborhood, so recall is
    exact. All arithmetic is integer (micro-unit coordinates, squared
    distances) — no float, no epsilon. At 100 TB the shuffle key is the
    grid cell: skew equals point density per cell, handled like any heavy
    hitter (smaller cells or AQE skew split)."""
    pts = (
        load(spark, sf_dir, "customer")
        .selectExpr("c_custkey AS k", _PT_SPARK_X, _PT_SPARK_Y)
        .selectExpr("k", "x", "y", "x div 2000 AS cx", "y div 2000 AS cy")
    )
    offsets = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    ).alias("o")
    probe = pts.select("k", "x", "y", "cx", "cy", offsets).select(
        F.col("k").alias("ak"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("cx") + F.col("o.dx")).alias("pcx"),
        (F.col("cy") + F.col("o.dy")).alias("pcy"),
    )
    d2 = (F.col("ax") - F.col("x")) * (F.col("ax") - F.col("x")) + (
        F.col("ay") - F.col("y")
    ) * (F.col("ay") - F.col("y"))
    pairs = (
        probe.join(
            pts,
            (F.col("pcx") == F.col("cx")) & (F.col("pcy") == F.col("cy")),
        )
        .filter((F.col("ak") < F.col("k")) & (d2 <= _R2))
        .select("cx", "cy", d2.alias("d2"))
    )
    return pairs.groupBy("cx", "cy").agg(
        F.count("*").cast("bigint").alias("n_close_pairs"),
        F.min("d2").cast("bigint").alias("min_d2"),
    )
