"""Round-8 invariants.

1. The staged (disk-bounded) DuckDB oracles in tools/oracle_staged.py are
   algebra-identical to the monolithic registry oracles — the proof that
   makes the 100x differential for the four iterative-graph keys exact
   (round-7 verdict ask #1). The staged forms decompose the unrolled CTE
   chains into per-round / per-slice queries with parquet intermediates;
   this test pins staged == monolithic row-for-row at the test SF, so any
   drift between an operator's oracle and its staged twin fails the suite.

2. Keyed streaming state is EVICTED once the watermark passes — the
   state-bound story in BENCH_stream_r08.json (round-7 verdict ask #8)
   rests on watermark eviction actually happening, so it is pinned by a
   two-batch replay where batch 2's event time advances the watermark past
   every batch-1 key.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from tests.compare import canon_frame

from tools.oracle_staged import STAGED_ORACLES, _fetch


@pytest.mark.parametrize("key", sorted(STAGED_ORACLES))
def test_staged_oracle_matches_monolithic(key, sf_dir, tmp_path):
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    work = str(tmp_path)
    staged = STAGED_ORACLES[key](sf_dir, work)
    mono = _fetch(sf_dir, work, oracles[key])
    assert sorted(staged.columns) == sorted(mono.columns)
    a = [repr(r) for r in canon_frame(staged)]
    b = [repr(r) for r in canon_frame(mono)]
    assert a == b, f"{key}: staged oracle diverged from monolithic"


def test_watermark_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark drops a key's state once the watermark
    passes its event time: 50 keys arrive in batch 1, batch 2 sits 2 h
    later (>> the 30-min delay), so the no-data/commit batches after it
    must evict all 50 batch-1 rows from the store. This is the eviction
    guarantee the BENCH_stream state bounds (`rows ~= horizon x arrival
    rate`) depend on."""
    src = tmp_path / "ev"
    src.mkdir()
    t0 = 1_700_000_000  # any fixed epoch; determinism, not wall time
    b1 = spark.range(50).select(
        F.col("id").alias("user_id"),
        F.expr(f"timestamp_seconds({t0} + id)").alias("ts"),
    )
    b1.coalesce(1).write.parquet(str(src / "b1.parquet"))
    b2 = spark.range(50, 60).select(
        F.col("id").alias("user_id"),
        F.expr(f"timestamp_seconds({t0} + 7200 + id)").alias("ts"),
    )
    b2.coalesce(1).write.parquet(str(src / "b2.parquet"))
    # FileStreamSource orders files by modification time: pin it so b1 is
    # batch 1 (the writes above can land in the same mtime tick)
    now = time.time()
    for i, d in enumerate(("b1.parquet", "b2.parquet")):
        for f in (src / d).glob("*"):
            os.utime(f, (now + i * 10, now + i * 10))

    progress: list[dict] = []

    from pyspark.sql.streaming import StreamingQueryListener

    class Grab(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            try:
                progress.append(json.loads(event.progress.json))
            except Exception:  # noqa: BLE001
                pass

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    schema = "user_id bigint, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id"])
    )
    grab = Grab()
    spark.streams.addListener(grab)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    try:
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        time.sleep(1.5)  # listener drains asynchronously
    finally:
        spark.streams.removeListener(grab)

    assert spark.read.parquet(out_dir).count() == 60  # all keys distinct
    removed = sum(
        int(s.get("numRowsRemoved", 0))
        for e in progress
        for s in e.get("stateOperators", [])
    )
    finals = [
        int(s.get("numRowsTotal", 0))
        for e in progress[-1:]
        for s in e.get("stateOperators", [])
    ]
    assert removed >= 50 or (finals and finals[0] <= 10), (
        f"watermark did not evict batch-1 state: removed={removed}, "
        f"final state rows={finals}, batches={len(progress)}"
    )
