#!/usr/bin/env python
"""Streaming kill-and-restore at 100x (VERDICT r10 ask #7).

RocksDB recovery was pinned at fixture scale (tests/test_streaming_
recovery.py) and 100x THROUGHPUT was measured (BENCH_stream_r10.json),
but kill-and-restore at 100x state was not. This drill runs the keyed
cumulative-state shape (per-user count + value-micros sum over the 100x
events replica: 10M rows, 150k distinct users) under the RocksDB
provider, KILLS the query mid-replay (q.stop() aborts the in-flight
micro-batch; only the checkpoint survives), restarts from the same
checkpoint, and asserts the recovered final state is HASH-IDENTICAL to
the single-pass batch truth.

Sink discipline: foreachBatch -> parquet, mode=overwrite at a
deterministic per-batch-id path — the idempotent-writer recipe — in
update mode, so each batch lands only the keys it touched. The final
per-user state is the row with the highest batch id per user ACROSS BOTH
runs (update-mode emissions are cumulative), which equals the batch
GROUP BY iff recovery neither dropped nor double-counted any pre-kill
file. An uninterrupted twin run provides the wall-clock reference.

Usage: python tools/bench_stream_recovery.py [SF_DIR] [OUT.json]
Defaults: /tmp/scale/sf10, BENCH_stream_recovery_r11.json
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

WORK = "/tmp/c2spark_io/recovery_r11"


def _session():
    from c2_duckdb_runner_spark.session import get_spark

    spark = get_spark(app_name="c2-stream-recovery")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    return spark


def _agg(src):
    # decimal sum -> micros keeps the fingerprint integer-exact (the
    # float-aggregate oracle-parity rule)
    return src.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total_dec"),
    )


def _start(spark, sf_dir: str, out_dir: str, ckpt: str, files_per_trigger: int):
    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch={batch_id}")

    # maxFilesPerTrigger bounds each micro-batch so the replay has many
    # commit points to kill between (the replica has 32 part files)
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(f"{sf_dir}/events*.parquet")
    )
    ts_type = dict(s.dtypes).get("ts")
    if ts_type == "timestamp_ntz":
        s = s.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        _agg(s)
        .writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def _final_state(spark, out_dir: str):
    """Last update-mode emission per user across every committed batch."""
    rows = spark.read.option("basePath", out_dir).parquet(out_dir)
    # update-mode emissions are cumulative, so per user the row from the
    # highest batch id IS the final state — a single max-of-struct agg
    # (no self-join, no window)
    return (
        rows.groupBy("user_id")
        .agg(F.max(F.struct("batch_id", "n", "total_dec")).alias("last"))
        .select(
            "user_id",
            F.col("last.n").alias("n"),
            (F.col("last.total_dec") * 1000000).cast("long").alias("micros"),
        )
    )


def _hash_df(df) -> tuple[int, str]:
    pdf = df.orderBy("user_id").toPandas()
    h = hashlib.sha256()
    for t in pdf.itertuples(index=False):
        h.update(f"{t[0]}|{t[1]}|{t[2]}".encode())
    return len(pdf), h.hexdigest()[:16]


def _rocks_sst_max(progress: list) -> int:
    best = 0
    for p in progress:
        for s in p.get("stateOperators", []):
            best = max(best, int(
                s.get("customMetrics", {}).get("rocksdbSstFileSize", 0)))
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else (
        "BENCH_stream_recovery_r11.json"
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = _session()

    # batch truth (single pass, integer-exact)
    truth = _agg(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select(
        "user_id", "n",
        (F.col("total_dec") * 1000000).cast("long").alias("micros"),
    )
    t0 = time.time()
    truth_n, truth_hash = _hash_df(truth)
    batch_wall = round(time.time() - t0, 1)
    print(f"batch truth: {truth_n} users, hash {truth_hash}, "
          f"{batch_wall}s", flush=True)

    # --- uninterrupted twin -------------------------------------------
    twin_out, twin_ckpt = f"{WORK}/twin_out", f"{WORK}/twin_ckpt"
    t0 = time.time()
    q = _start(spark, sf_dir, twin_out, twin_ckpt, files_per_trigger=4)
    q.awaitTermination()
    twin_wall = round(time.time() - t0, 1)
    twin_batches = len([d for d in os.listdir(twin_out) if d.startswith("batch=")])
    twin_sst = _rocks_sst_max([json.loads(p.json) for p in q.recentProgress])
    twin_n, twin_hash = _hash_df(_final_state(spark, twin_out))
    print(f"twin: {twin_batches} batches, {twin_wall}s, sst_max "
          f"{twin_sst/1e6:.0f}MB, hash {twin_hash}", flush=True)
    assert (twin_n, twin_hash) == (truth_n, truth_hash), "twin != batch truth"

    # --- kill-and-restore run -----------------------------------------
    rec_out, rec_ckpt = f"{WORK}/rec_out", f"{WORK}/rec_ckpt"
    kill_after = max(2, twin_batches // 2)
    t0 = time.time()
    q = _start(spark, sf_dir, rec_out, rec_ckpt, files_per_trigger=4)
    killed_at = None
    while q.isActive:
        done = len([d for d in os.listdir(rec_out)
                    if d.startswith("batch=")]) if os.path.isdir(rec_out) else 0
        if done >= kill_after:
            q.stop()  # aborts the IN-FLIGHT micro-batch; checkpoint survives
            killed_at = done
            break
        time.sleep(0.5)
    q.awaitTermination()
    wall_run1 = round(time.time() - t0, 1)
    if killed_at is None:
        raise SystemExit("stream finished before the kill fired — lower "
                         "files_per_trigger")
    print(f"killed after {killed_at} committed batches ({wall_run1}s)",
          flush=True)

    # cold restart: fresh session, same checkpoint — state must come back
    # from RocksDB, offsets from the WAL
    spark.stop()
    spark = _session()
    t0 = time.time()
    q = _start(spark, sf_dir, rec_out, rec_ckpt, files_per_trigger=4)
    q.awaitTermination()
    wall_run2 = round(time.time() - t0, 1)
    rec_sst = _rocks_sst_max([json.loads(p.json) for p in q.recentProgress])
    rec_batches = len([d for d in os.listdir(rec_out) if d.startswith("batch=")])
    if rec_batches <= killed_at:
        raise SystemExit(
            f"kill fired after the last batch ({killed_at} committed, "
            f"{rec_batches} total) — nothing was recovered; lower "
            "files_per_trigger so the drill actually exercises restore"
        )
    rec_n, rec_hash = _hash_df(_final_state(spark, rec_out))
    ok = (rec_n, rec_hash) == (truth_n, truth_hash)
    print(f"recovered: {rec_batches} batches total, run2 {wall_run2}s, "
          f"sst_max {rec_sst/1e6:.0f}MB, hash {rec_hash} "
          f"{'== truth' if ok else '!= TRUTH — FAIL'}", flush=True)

    out = {
        "what": (
            "100x streaming kill-and-restore drill (RocksDB provider): "
            "per-user cumulative (count, value-micros) over the 100x "
            "events replica, killed mid-replay after half the committed "
            "micro-batches, restarted COLD (new session) from the same "
            "checkpoint; final state hash-compared to single-pass batch "
            "truth. foreachBatch idempotent per-batch-id parquet sink."
        ),
        "sf_dir": sf_dir,
        "input_rows": 10_000_000 if "sf10" in sf_dir else None,
        "distinct_users": truth_n,
        "truth_hash": truth_hash,
        "uninterrupted": {
            "wall_sec": twin_wall, "batches": twin_batches,
            "rocksdb_sst_bytes_max": twin_sst, "hash": twin_hash,
            "hash_match": True,
        },
        "kill_restore": {
            "killed_after_batches": killed_at,
            "wall_run1_sec": wall_run1,
            "wall_run2_sec": wall_run2,
            "batches_total": rec_batches,
            "rocksdb_sst_bytes_max": rec_sst,
            "hash": rec_hash,
            "hash_match": ok,
        },
        "batch_truth_wall_sec": batch_wall,
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
