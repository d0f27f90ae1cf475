"""Pin the hash-dependent dedup variants (no DuckDB oracle) against the
exact n-gram-Jaccard query, which *is* oracle-checked."""

from __future__ import annotations

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def _pairs(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH output is exact-verified (jac >= 0.8), so it must be a subset of
    the brute blocking query; at the fixture's jac >= 0.97 planted dups the
    miss probability per pair is ~(1-0.97^4)^8 ~ 1e-9, so require equality
    on the high-similarity pairs."""
    from c2_duckdb_runner_spark.operators.dedup import _minhash_lsh_pairs

    exact = QUERIES["dedup_near_ngram_jaccard"](spark, sf_dir)
    lsh = _minhash_lsh_pairs(spark, sf_dir)
    exact_pairs = _pairs(exact)
    lsh_pairs = _pairs(lsh)
    assert lsh_pairs <= exact_pairs
    high = {(r["a_id"], r["b_id"]) for r in exact.collect() if r["jac"] >= 0.95}
    assert high <= lsh_pairs
    assert len(lsh_pairs) > 0


def test_minhash_lsh_verdict_row(spark, sf_dir):
    """The registered query's recall verdict must hold: one row, truth-pair
    count > 0, recall_ok = 1."""
    row = QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    assert len(row) == 1
    assert row[0]["n_true_pairs"] > 0
    assert row[0]["recall_ok"] == 1


def test_simhash_finds_planted_near_dups(spark, sf_dir):
    """Near-identical token sets (jac >= 0.97) must land within hamming <= 8.

    Membership is probed directly against `_simhash_fingerprints` — the
    same audit `dedup_simhash` itself performs since the r10 rewrite (the
    old `_simhash_pairs` candidate generator went quadratic at the 100x
    replica and was deleted): join the truth pairs to the fingerprint
    table twice and check popcount(xor). The 9-block pigeonhole blocking
    is sound for radius 8, so hamming <= 8 is equivalent to 'the blocked
    production path would pair them'."""
    from c2_duckdb_runner_spark.operators.dedup import _simhash_fingerprints
    from pyspark.sql import functions as F

    exact = QUERIES["dedup_near_ngram_jaccard"](spark, sf_dir)
    high = {(r["a_id"], r["b_id"]) for r in exact.collect() if r["jac"] >= 0.97}
    assert high, "fixture must plant near-identical (jac >= 0.97) pairs"

    fp = _simhash_fingerprints(spark, sf_dir)
    truth = spark.createDataFrame(
        [(a, b) for a, b in sorted(high)], "a_id BIGINT, b_id BIGINT"
    )
    probed = (
        truth
        .join(fp.select(F.col("doc_id").alias("a_id"),
                        F.col("simhash").alias("a_sim")), "a_id")
        .join(fp.select(F.col("doc_id").alias("b_id"),
                        F.col("simhash").alias("b_sim")), "b_id")
        .select("a_id", "b_id",
                F.expr("bit_count(a_sim ^ b_sim)").alias("hamming"))
        .collect()
    )
    # every truth pair must have both fingerprints present
    assert len(probed) == len(high)
    for r in probed:
        assert 0 <= r["hamming"] <= 64
    # simhash is a lossy sketch: require >= 90% recall on the near-identical set
    within = sum(1 for r in probed if r["hamming"] <= 8)
    recall = within / len(high)
    assert recall >= 0.9, f"simhash recall {recall:.2f} over {len(high)} pairs"


def test_simhash_verdict_row(spark, sf_dir):
    row = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert len(row) == 1
    assert row[0]["n_true_pairs"] > 0
    assert row[0]["recall_ok"] == 1


def test_exact_dedup_collapses_planted_dups(spark, sf_dir):
    df = QUERIES["dedup_exact"](spark, sf_dir)
    rows = df.collect()
    dup_groups = [r for r in rows if r["dup_count"] == 2]
    assert len(dup_groups) > 0
    for r in dup_groups:
        assert r["keeper_id"] < 100000
