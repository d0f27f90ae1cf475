"""Fixture tables: path-based parquet loads, no catalog.

Mirrors the reference's data model — a directory of files, table names are
path literals spliced into the query (``main.cc:164-169``). We read
self-describing parquet (schema inferred from the footer, same as the
reference's engine; ``main.cc:181-183`` declares no schema anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region=5 rows, nation=25 — fixed size regardless of SF). supplier/part/
# customer scale with SF so they are NOT on this list.
BROADCAST_DIMS = {"region", "nation"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (one parquet file per table, per TESTDATA.md).

    ``events.ts`` is parquet TIMESTAMP(NANOS). Depending on the Spark build
    it surfaces either as LongType nanos (``nanosAsLong`` honored) or as
    TIMESTAMP_NTZ (this 4.1.2 build). Normalize both to TimestampType:

    - bigint nanos → ``timestamp_micros(ts div 1000)`` (integer ``div``, not
      ``/``: epoch-ns ≈ 1.7e18 overflows double's 53-bit mantissa);
    - TIMESTAMP_NTZ → ``cast(timestamp)``. The session timezone is pinned
      UTC (session.py), so the cast is value-preserving.

    DuckDB 1.0 reads the same column as µs TIMESTAMP, so both engines see
    identical values either way.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """Load + spread for compute-heavy map stages.

    The fixture files are single-row-group parquet, so a scan is ONE task no
    matter what ``maxPartitionBytes`` says (a row group can't be split) —
    and any expensive per-row compute chained onto it would run on one core.
    When the scan yields fewer partitions than half the cores, repartition
    on ``key`` to spread the compute; the shuffle of the raw rows is far
    cheaper than serializing the map work. At production scale the input is
    many files/row groups, the condition is false, and this is a no-op —
    exactly the behavior a 1000-executor cluster wants.
    """
    df = load(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, cores // 2):
        df = df.repartition(cores, key)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Ephemeral temp views so queries can also be expressed in spark.sql."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
