#!/usr/bin/env python
"""Streaming throughput/latency/state artifact (round-6 verdict item 5).

The 15 stream_* keys are correctness-verified by replay oracles, but no
artifact records what a capacity planner needs: rows/s, micro-batch
latency, and state-store size — and whether state grows super-linearly
with input. This tool drives every stream_* registry key at sf0.1 and at
the 10x replica with a StreamingQueryListener attached, and aggregates
each run's progress events into per-key metrics:

- input_rows / n_batches / wall_sec / rows_per_sec
- batch_ms_max (worst micro-batch duration reported by the engine)
- state_rows_max / state_bytes_max (largest stateful-operator footprint)
- x10 ratios for rows, wall, and state

Usage: python tools/bench_stream.py OUT.json [sf_small] [sf_big]
Defaults: sf_small=/root/testdata/sf0.1, sf_big=/tmp/scale/sf1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402


class _Collector(StreamingQueryListener):
    """Buffers every progress event; the driver loop snapshots and clears
    the buffer around each query so events attribute to the right key."""

    def __init__(self) -> None:
        self.events: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        try:
            self.events.append(json.loads(event.progress.json))
        except Exception:  # noqa: BLE001 — a dropped event only loses metrics
            pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def _summarize(events: list[dict], wall: float) -> dict:
    rows = sum(int(e.get("numInputRows", 0)) for e in events)
    batch_ms = [
        int(e.get("durationMs", {}).get("triggerExecution", 0)) for e in events
    ]
    srows = [
        int(s.get("numRowsTotal", 0))
        for e in events
        for s in e.get("stateOperators", [])
    ]
    sbytes = [
        int(s.get("memoryUsedBytes", 0))
        for e in events
        for s in e.get("stateOperators", [])
    ]
    # RocksDB reports its real footprint through custom metrics;
    # memoryUsedBytes alone under-reports it (SST files are on disk)
    rocks_mem = [
        int(s.get("customMetrics", {}).get("rocksdbTotalMemoryUsage", 0))
        for e in events
        for s in e.get("stateOperators", [])
    ]
    rocks_sst = [
        int(s.get("customMetrics", {}).get("rocksdbSstFileSize", 0))
        for e in events
        for s in e.get("stateOperators", [])
    ]
    out = {
        "wall_sec": round(wall, 3),
        "input_rows": rows,
        "n_batches": len(events),
        "rows_per_sec": round(rows / wall) if wall > 0 else None,
        "batch_ms_max": max(batch_ms) if batch_ms else 0,
        "state_rows_max": max(srows) if srows else 0,
        "state_bytes_max": max(sbytes) if sbytes else 0,
    }
    if any(rocks_mem) or any(rocks_sst):
        out["rocksdb_mem_bytes_max"] = max(rocks_mem)
        out["rocksdb_sst_bytes_max"] = max(rocks_sst)
    return out


# 100 TB design point (round-7 verdict ask #8): for every key that holds
# KEYED state, the bound as a function of watermark horizon x key arrival
# rate, and the state-store provider it runs on. Window-agg keys hold
# O(#open windows) and are omitted — their bound is the window count, not
# a key-cardinality product. Eviction-at-watermark is pinned by
# tests/test_invariants_r8.py::test_watermark_evicts_state.
STATE_BOUNDS = {
    "stream_dedup": {
        "state_bound": (
            "one state row per distinct (user_id, event_type) whose last "
            "sighting is within the 30-min watermark horizon: rows ~= "
            "horizon x new-key arrival rate; dropDuplicatesWithinWatermark "
            "evicts a key once the watermark passes its event time"
        ),
        "provider": "HDFSBackedStateStore (session default)",
        "evicted_by_watermark": True,
    },
    "stream_session_window": {
        "state_bound": (
            "one open session per user active within gap+horizon: rows ~= "
            "(gap + watermark delay) x session arrival rate; a session is "
            "flushed and its state dropped when the watermark passes "
            "session_end"
        ),
        "provider": "HDFSBackedStateStore (session default)",
        "evicted_by_watermark": True,
    },
    "stream_stateful_counts": {
        "state_bound": (
            "one bigint per distinct user_id EVER seen — a running counter "
            "is cumulative by semantics (GroupStateTimeout.NoTimeout), so "
            "state = |distinct keys|, NOT horizon-bounded; a production "
            "deployment bounds it with ProcessingTimeTimeout/TTL eviction "
            "or periodic state compaction to a table"
        ),
        "provider": "HDFSBackedStateStore (session default)",
        "evicted_by_watermark": False,
    },
    "stream_stream_interval_join": {
        "state_bound": (
            "each side buffers rows still joinable under the event-time "
            "bound: rows ~= arrival rate x (watermark delay + 7-day join "
            "interval) per side; a row is evicted once the other side's "
            "watermark passes its latest match time"
        ),
        "provider": "HDFSBackedStateStore (session default)",
        "evicted_by_watermark": True,
    },
    "stream_transform_with_state": {
        "state_bound": (
            "one (count, sum) ValueState per distinct user_id — cumulative "
            "by semantics (timeMode None), state = |distinct keys|; the "
            "transformWithState API exposes per-state TTL for bounding it "
            "in production"
        ),
        "provider": (
            "RocksDBStateStoreProvider (pinned by the query; "
            "applyInPandasWithState fallback uses the session default)"
        ),
        "evicted_by_watermark": False,
    },
}


def run_pass(spark, keys, qs, sf_dir: str, coll: _Collector) -> dict:
    out: dict[str, dict] = {}
    for k in keys:
        coll.events.clear()
        t0 = time.monotonic()
        try:
            qs[k](spark, sf_dir).count()  # materialize the sink contents
            wall = time.monotonic() - t0
            time.sleep(1.5)  # listener thread drains asynchronously
            out[k] = _summarize(list(coll.events), wall)
        except Exception as ex:  # noqa: BLE001
            out[k] = {"error": str(ex).split("\n", 1)[0][:120]}
        spark.catalog.clearCache()
        print(f"{sf_dir} {k}: {out[k]}", flush=True)
    return out


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: bench_stream.py OUT.json [sf_small] [sf_big] [sf_xl]")
    target = sys.argv[1]
    sf_small = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sf_big = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale/sf1"
    # round-10 (verdict r9 ask #5): the state-bound claims measured where
    # they matter — the 100x replica; empty string skips the pass
    sf_xl = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale/sf10"

    from c2_duckdb_runner_spark import session as session_mod
    import __spark_entry__ as e

    spark = session_mod.get_spark(app_name="c2-spark-bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    keys = sorted(k for k in qs if k.startswith("stream_"))

    coll = _Collector()
    spark.streams.addListener(coll)
    # warm-up: JVM + state-store + python-worker init off the first sample
    qs[keys[0]](spark, sf_small).count()

    small = run_pass(spark, keys, qs, sf_small, coll)
    big = run_pass(spark, keys, qs, sf_big, coll)
    xl = run_pass(spark, keys, qs, sf_xl, coll) if sf_xl else {}

    # provider comparison (verdict r8 ask #4): the keyed-state keys re-run
    # under the RocksDB provider — the backend that keeps state off-heap at
    # the 100 TB design point — side by side with the HDFSBacked defaults
    # above. stream_transform_with_state pins RocksDB itself, so its
    # baseline pass already measures RocksDB; it is re-run here anyway so
    # both columns exist for every keyed key.
    keyed = sorted(STATE_BOUNDS)
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(prov_key, rocks)
    try:
        rocks_small = run_pass(spark, keyed, qs, sf_small, coll)
        rocks_big = run_pass(spark, keyed, qs, sf_big, coll)
        rocks_xl = run_pass(spark, keyed, qs, sf_xl, coll) if sf_xl else {}
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)

    queries = {}
    for k in keys:
        s, b, x = small.get(k, {}), big.get(k, {}), xl.get(k, {})
        ent = {"sf01": s, "sf1": b}
        if x:
            ent["sf10"] = x
        if "error" not in s and "error" not in b:
            for f in ("input_rows", "wall_sec", "state_rows_max"):
                a, bb = s.get(f) or 0, b.get(f) or 0
                ent[f"{f}_x10"] = round(bb / a, 2) if a else None
            # a stateful op whose state grows faster than its input is the
            # unbounded-state smell this artifact exists to catch
            if (
                s.get("state_rows_max")
                and (ent.get("state_rows_max_x10") or 0)
                > 2 * (ent.get("input_rows_x10") or 1)
            ):
                ent["note"] = "state grows super-linearly vs input"
        if x and "error" not in x and "error" not in b:
            # the sf1 -> sf10 step: the 100x state-bound measurement
            for f in ("input_rows", "wall_sec", "state_rows_max"):
                a, xx = b.get(f) or 0, x.get(f) or 0
                ent[f"{f}_x10_sf10"] = round(xx / a, 2) if a else None
            if (
                b.get("state_rows_max")
                and (ent.get("state_rows_max_x10_sf10") or 0)
                > 2 * (ent.get("input_rows_x10_sf10") or 1)
            ):
                ent["note_sf10"] = "state grows super-linearly vs input"
        if k in STATE_BOUNDS:
            ent.update(STATE_BOUNDS[k])
            rs, rb = rocks_small.get(k, {}), rocks_big.get(k, {})
            rx = rocks_xl.get(k, {})
            ent["provider_comparison"] = {
                "hdfs_backed": {"sf01": s, "sf1": b, "sf10": x},
                "rocksdb": {"sf01": rs, "sf1": rb, "sf10": rx},
            }
            # guard on rb (the sf1 RocksDB pass — the numerator), not rs:
            # an errored sf1 run must not record a misleading 0.0 ratio
            if (
                "error" not in rb
                and "error" not in b
                and b.get("wall_sec")
                and rb.get("wall_sec")
            ):
                ent["provider_comparison"]["rocksdb_vs_hdfs_wall_x_sf1"] = (
                    round(rb["wall_sec"] / b["wall_sec"], 2)
                )
            if (
                "error" not in rx
                and "error" not in x
                and x.get("wall_sec")
                and rx.get("wall_sec")
            ):
                ent["provider_comparison"]["rocksdb_vs_hdfs_wall_x_sf10"] = (
                    round(rx["wall_sec"] / x["wall_sec"], 2)
                )
        queries[k] = ent

    out = {
        "what": (
            "Streaming family throughput/latency/state artifact (verdict "
            "r06 item 5; r9 ask #5 extends it to the 100x replica): every "
            "stream_* key driven availableNow at sf0.1, 10x, and 100x "
            "with a StreamingQueryListener; per-key "
            "rows/s, worst micro-batch ms, and max state-store footprint, "
            "with x10 ratios. State bounded by window/key cardinality "
            "should grow ~1x; input-proportional state is flagged. Keyed-"
            "state keys additionally carry provider_comparison: the same "
            "runs under RocksDBStateStoreProvider (off-heap state, the "
            "100 TB backend) vs HDFSBackedStateStore, with RocksDB memory/"
            "SST custom metrics."
        ),
        "method": {
            "trigger": "availableNow",
            "shuffle_partitions_during_stream": 8,
            "warmup": "first key once at sf0.1, untimed",
            "sink": "memory (parquet for the two parquet-sink keys)",
        },
        "queries": queries,
    }
    with open(os.path.join(REPO, target), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {target}: {len(keys)} stream keys")
    spark.stop()


if __name__ == "__main__":
    main()
