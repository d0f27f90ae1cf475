#!/usr/bin/env python
"""Exploratory fuzz run: many seeds, report every Spark-vs-DuckDB divergence.

Usage: python tools/fuzz_explore.py [N_PER_TABLE] [SF_DIR] [SLOT] [PROFILE]

SLOT: where (default) | select | group | order | join | sub | setop —
the round-10/11 widened slots reuse this loop: each non-where case is one
dual-rendered query per seed, compared on its one-row BIGINT fingerprint
(join/sub/setop iterate table PAIRS from fuzzing.JOIN_PAIRS instead of
single tables). PROFILE: default |
hostile (hostile drops X5 case mapping from the grammar; pair it with a
hostile fixture dir built by c2_duckdb_runner_spark.hostile).

This is the discovery loop behind tests/test_fuzz_differential.py: run it
wide (e.g. 2000 seeds/table), shrink anything that diverges, pin the class
in the fuzzing.py ledger + a trap test, re-run until dry. CI then locks a
green seed range forever.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from c2_duckdb_runner_spark import fuzzing  # noqa: E402
from c2_duckdb_runner_spark.session import get_spark  # noqa: E402
from c2_duckdb_runner_spark.tables import load  # noqa: E402

BATCH = 40


def run_slot_pass(spark, con, tables, n, slot, profile):
    """Widened slots: one query pair per seed, one-row fingerprints.

    join/sub/setop (round 11) iterate fuzzing.JOIN_PAIRS: `tables` becomes
    the pair list and the per-case generator closes over the pair."""
    if slot in ("join", "sub", "setop"):
        if slot == "join":
            units = [
                (f"{a}x{b}",
                 lambda s, a=a, b=b, nat=nat: fuzzing.gen_join(
                     a, b, s, nat, profile=profile))
                for a, b, nat in fuzzing.JOIN_PAIRS
            ]
        elif slot == "sub":
            units = [
                (f"{a}<-{b}",
                 lambda s, a=a, b=b: fuzzing.gen_subquery_batch(
                     a, b, s, n=4, profile=profile))
                for a, b, _ in fuzzing.JOIN_PAIRS[:6]
            ]
        else:
            pairs = [(a, b) for a, b, _ in fuzzing.JOIN_PAIRS[:5]] + [
                ("lineitem", "lineitem"), ("documents", "documents")]
            units = [
                (f"{a}+{b}",
                 lambda s, a=a, b=b: fuzzing.gen_setop(a, b, s,
                                                       profile=profile))
                for a, b in pairs
            ]
        n_div = n_err = 0
        t0 = time.time()
        for tag, gen1 in units:
            for s in range(n):
                q = gen1(s)
                try:
                    a = tuple(spark.sql(q.spark).collect()[0])
                    b = tuple(con.execute(q.duck).fetchone())
                    if a != b:
                        n_div += 1
                        print(f"DIVERGE {slot} {tag} seed={s}: {a} vs {b}"
                              f"\n  spark: {q.spark[:500]}"
                              f"\n  duck:  {q.duck[:500]}")
                except Exception as ex:  # noqa: BLE001
                    n_err += 1
                    print(f"ERROR {slot} {tag} seed={s}: {str(ex)[:200]}"
                          f"\n  spark: {q.spark[:500]}"
                          f"\n  duck:  {q.duck[:500]}")
            print(f"{slot} {tag}: {n} seeds done ({time.time()-t0:.0f}s)",
                  flush=True)
        print(f"\ntotal: {n*len(units)} {slot} queries, {n_div} divergences, "
              f"{n_err} errors in {time.time()-t0:.0f}s")
        sys.exit(1 if (n_div or n_err) else 0)

    gen = {
        "select": fuzzing.gen_select_batch,
        "group": fuzzing.gen_groupagg,
        "order": fuzzing.gen_orderlimit,
    }[slot]
    n_div = n_err = 0
    t0 = time.time()
    for table in tables:
        for s in range(n):
            q = gen(table, s, profile=profile) if slot != "select" else gen(
                table, s, profile=profile
            )
            try:
                a = tuple(spark.sql(q.spark).collect()[0])
                b = tuple(con.execute(q.duck).fetchone())
                if a != b:
                    n_div += 1
                    print(f"DIVERGE {slot} {table} seed={s}: {a} vs {b}"
                          f"\n  spark: {q.spark[:400]}"
                          f"\n  duck:  {q.duck[:400]}")
            except Exception as ex:  # noqa: BLE001
                n_err += 1
                print(f"ERROR {slot} {table} seed={s}: {str(ex)[:200]}"
                      f"\n  spark: {q.spark[:400]}\n  duck:  {q.duck[:400]}")
        print(f"{slot} {table}: {n} seeds done ({time.time()-t0:.0f}s)",
              flush=True)
    print(f"\ntotal: {n*len(tables)} {slot} queries, {n_div} divergences, "
          f"{n_err} errors in {time.time()-t0:.0f}s")
    sys.exit(1 if (n_div or n_err) else 0)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    slot = sys.argv[3] if len(sys.argv) > 3 else "where"
    profile = sys.argv[4] if len(sys.argv) > 4 else "default"

    spark = get_spark("fuzz-explore")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    tables = list(fuzzing.FUZZ_TABLES)
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    if slot != "where":
        run_slot_pass(spark, con, tables, n, slot, profile)
        return

    n_div = n_err = 0
    t0 = time.time()
    for table in tables:
        for lo in range(0, n, BATCH):
            seeds = list(range(lo, min(lo + BATCH, n)))
            preds = [
                fuzzing.gen_predicate(table, s, profile=profile)
                for s in seeds
            ]
            try:
                srow = spark.sql(
                    fuzzing.fingerprint_sql(table, preds, "spark")
                ).collect()[0]
                drow = con.execute(
                    fuzzing.fingerprint_sql(table, preds, "duck")
                ).fetchone()
            except Exception:
                # isolate the offending predicate one by one
                for s, p in zip(seeds, preds):
                    try:
                        a = spark.sql(
                            fuzzing.fingerprint_sql(table, [p], "spark")
                        ).collect()[0]
                        b = con.execute(
                            fuzzing.fingerprint_sql(table, [p], "duck")
                        ).fetchone()
                        if (a[0], a[1]) != (b[0], b[1]):
                            n_div += 1
                            print(f"DIVERGE {table} seed={s}\n  spark: {p.spark}"
                                  f"\n  duck:  {p.duck}\n  got {tuple(a)} vs {tuple(b)}")
                    except Exception as ex:  # noqa: BLE001
                        n_err += 1
                        print(f"ERROR {table} seed={s}: {str(ex)[:200]}"
                              f"\n  spark: {p.spark}\n  duck:  {p.duck}")
                continue
            for i, s in enumerate(seeds):
                a = (srow[2 * i], srow[2 * i + 1])
                b = (drow[2 * i], drow[2 * i + 1])
                if a != b:
                    n_div += 1
                    p = preds[i]
                    print(f"DIVERGE {table} seed={s}: {a} vs {b}"
                          f"\n  spark: {p.spark}\n  duck:  {p.duck}")
        print(f"{table}: {n} seeds done ({time.time()-t0:.0f}s)", flush=True)

    print(f"\ntotal: {n*len(tables)} predicates, {n_div} divergences, "
          f"{n_err} errors in {time.time()-t0:.0f}s")
    sys.exit(1 if (n_div or n_err) else 0)


if __name__ == "__main__":
    main()
