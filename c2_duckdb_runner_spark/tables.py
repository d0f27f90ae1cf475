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

    ``events.ts`` is parquet TIMESTAMP(NANOS): with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as LongType nanos and
    we convert to µs TimestampType with integer division (``div``, not ``/``:
    epoch-ns ≈ 1.7e18 overflows double's 53-bit mantissa). DuckDB 1.0 reads
    the same column as µs TIMESTAMP, so both engines see identical values.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Ephemeral temp views so queries can also be expressed in spark.sql."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
