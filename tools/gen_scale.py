#!/usr/bin/env python
"""Generate a scaled-up copy of a fixture directory for scale-validation
benchmarks (VERDICT r03 item 6: evidence that the expensive operators grow
~linearly in rows, not just a design argument).

Usage: python tools/gen_scale.py [factor] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/scale/sf1

Model: ``factor`` key-shifted replicas of the source tables, built so each
operator's DATA-DEPENDENT structure scales the way a real corpus does —
replica structure must not manufacture super-linear blowups the operator
would never see in production, nor hide real ones:

- every key domain shifts by replica_i * 9,000,000 (divisible by 9/10/100,
  so the fixtures' deterministic ``key % m`` splits — dedup's planted dups,
  PageRank's seed set, the incremental batch split — keep their selectivity);
  FK pairs (orderkey, custkey, suppkey, partkey) shift together so the join
  graph becomes ``factor`` disjoint copies: joins/aggs grow linearly, graph
  components keep their diameter (the iterative-round count stays flat, as
  it would when a production graph grows in users rather than density);
- ``documents.text`` tokens get a per-replica suffix (replica 0 untouched):
  within-replica duplicate/near-dup structure is preserved exactly, across
  replicas nothing collides — near-dup pair counts scale linearly, the way
  a crawl 10x the size has ~10x the dup pairs, not 45x artificial twins;
- ``embeddings.label`` (the IVF-cell stand-in) shifts per replica: cell
  COUNT scales, per-cell occupancy stays bounded — the production scaling
  rule every cell-blocked operator documents;
- ``nation``/``region`` stay single-copy (dimensions don't scale);
- ``events.ts`` is untouched: 10x the users in the same wall-clock window,
  per-user series length constant (the streaming/sessionize scale model).

The tables are ours to synthesize here: this dataset feeds BENCH_sf1 only,
never the DuckDB-differential correctness gate (which runs exclusively on
the driver-generated /root/testdata fixtures).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from c2_duckdb_runner_spark import session as session_mod  # noqa: E402
from c2_duckdb_runner_spark.tables import load  # noqa: E402

SHIFT = 9_000_000  # per-replica key offset; divisible by 9, 10 and 100

# table -> columns that carry a scalable key domain
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id", "label"],
}
SINGLE_COPY = ["region", "nation"]


def scaled(df, table: str, i: int):
    if i == 0:
        return df
    for c in KEY_COLS[table]:
        df = df.withColumn(c, (F.col(c) + F.lit(i * SHIFT)).cast(df.schema[c].dataType))
    if table == "customer":
        # distinct customers must have distinct names (ER operators treat
        # the name as an identity field; 10 verbatim copies would plant
        # cross-replica false matches no real 10x corpus has)
        df = df.withColumn(
            "c_name", F.concat(F.col("c_name"), F.lit(f"r{i}"))
        )
    if table == "documents":
        df = df.withColumn(
            "text",
            F.array_join(
                F.transform(F.split("text", " "), lambda x: F.concat(x, F.lit(str(i)))),
                " ",
            ),
        )
    return df


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale/sf1"
    os.makedirs(out, exist_ok=True)
    spark = session_mod.get_spark(app_name="gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for table in SINGLE_COPY:
        load(spark, src, table).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
        print(f"{table}: single copy")
    for table in KEY_COLS:
        base = load(spark, src, table)
        parts = [scaled(base, table, i) for i in range(factor)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # several files per table so maxPartitionBytes-driven split mapping
        # behaves like a real multi-file dataset, not one giant file
        df.repartition(8).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        n = spark.read.parquet(f"{out}/{table}.parquet").count()
        print(f"{table}: {n} rows x{factor}")
    spark.stop()


if __name__ == "__main__":
    main()
