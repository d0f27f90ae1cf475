"""Mathematical invariants for the round-7 operators — laws the outputs
must satisfy REGARDLESS of data, checked at sf0.001 on top of the DuckDB
differential (which pins values; these pin meaning)."""

from __future__ import annotations

import math

import pytest

from c2_duckdb_runner_spark.registry import queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def run(spark):
    qs = queries()

    def _run(key: str):
        return qs[key](spark, SF).collect()

    return _run


def test_mood_median_chi2_nonneg_df_consistent(run):
    (r,) = run("stats_mood_median_test")
    assert r.chi2_micro >= 0
    assert r.df == r.k_groups - 1
    assert r.reject_95 in (0, 1)


def test_mcc_bounds_and_youden_bacc_identity(run):
    (r,) = run("eval_matthews_corrcoef")
    assert -1.0 <= r.mcc <= 1.0
    # youden = tpr + tnr - 1e6 and bacc = (tpr + tnr) div 2, so
    # youden - (2*bacc - 1e6) is exactly the floor remainder in {0, 1}
    assert r.youden_j_micro - (2 * r.balanced_acc_micro - 1_000_000) in (0, 1)
    assert r.tp + r.fp + r.fn + r.tn > 0


def test_cliffs_delta_pair_conservation(run):
    (r,) = run("stats_cliffs_delta")
    pairs = r.n_weekday * r.n_weekend
    assert 0 <= r.n_gt + r.n_lt <= pairs
    assert 0 <= r.delta_plus1_ppm <= 2_000_000


def test_kendall_w_range(run):
    (r,) = run("stats_kendall_w")
    assert r.s4 >= 0
    assert 0 <= r.w_ppm <= 1_000_000


def test_capture_recapture_sample_laws(run):
    (r,) = run("stats_capture_recapture")
    assert r.m <= min(r.n1, r.n2)
    assert r.n_true >= max(r.n1, r.n2)  # samples are subsets of the truth
    # Chapman is bias-corrected and <= Lincoln-Petersen + 1 numerically
    assert r.chapman >= r.m


def test_simpson_diversity_bounds(run):
    rows = run("text_simpson_diversity")
    assert rows
    for r in rows:
        assert 0 <= r.gini_simpson_ppm <= 1_000_000
        assert r.vocab <= r.n_tokens


def test_theil_nonneg(run):
    (r,) = run("stats_theil_between_nations")
    # T_between is a KL divergence to the uniform mix: >= 0 always
    assert r.theil_t >= 0.0


def test_dhondt_seats_conserved(run):
    rows = run("alloc_dhondt_divisor")
    assert sum(r.seats for r in rows) == 50
    assert all(r.seats >= 1 for r in rows)


def test_hampel_flags_and_mad(run):
    rows = run("ts_hampel_filter")
    assert rows
    for r in rows:
        assert r.mad7 >= 0
        assert r.is_outlier in (0, 1)
        if r.is_outlier:
            assert abs(r.n_events - r.med7) > 3 * r.mad7


def test_bollinger_flags_and_window(run):
    rows = run("ts_bollinger_breakout")
    assert rows
    for r in rows:
        assert r.breakout in (-1, 0, 1)
        assert 4 <= r.n_win <= 7


def test_hurst_proxy_consistent_with_rs(run):
    rows = run("ts_hurst_rescaled_range")
    assert rows
    for r in rows:
        assert r.rs > 0
        expect = math.log(r.rs) / math.log(r.n_days)
        assert abs(r.hurst_proxy - expect) < 1e-3


def test_rendezvous_docs_conserved(run):
    rows = run("pipeline_rendezvous_sharding")
    total = sum(r.n_docs for r in rows)
    share = sum(r.share_ppm for r in rows)
    assert len(rows) <= 16
    assert total > 0
    # floor divisions drop at most 1 ppm per shard
    assert 1_000_000 - 16 <= share <= 1_000_000


def test_jsd_bounded_by_ln2(run):
    rows = run("corpus_jsd_trigram_drift")
    assert rows
    for r in rows:
        assert 0.0 <= r.jsd_nats <= math.log(2) + 1e-9


def test_radius_counts_nested(run):
    (r,) = run("simsearch_radius_count")
    assert r.n_in_radius_cell <= r.n_in_radius <= r.n_scored
    assert 0 <= r.cell_recall_ppm <= 1_000_000


def test_kmeans_update_partition_of_corpus(run, spark):
    rows = run("embed_kmeans_update_round")
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_assigned for r in rows) == n_vecs
    assert all(r.shift_l1_micro >= 0 for r in rows)


def test_scurve_collisions_bounded(run):
    rows = run("dedup_lsh_scurve_audit")
    assert rows
    for r in rows:
        assert 0 <= r.n_collide <= r.n_pairs
        assert 0 <= r.collide_ppm <= 1_000_000
        assert 0 <= r.expected_ppm <= 1_000_000


def test_sainte_lague_seats_conserved_and_differs_from_dhondt(run):
    sl = run("alloc_sainte_lague")
    assert sum(r.seats for r in sl) == 50
    dh = {r.party: r.seats for r in run("alloc_dhondt_divisor")}
    # both valid apportionments of the same 50 seats over the same votes
    assert sum(dh.values()) == 50


def test_readability_counts_consistent(run):
    rows = run("text_readability_fk")
    assert rows
    for r in rows:
        # every word carries at least one vowel-group in this fixture's
        # ASCII prose; sentences floored at 1/doc
        assert r.n_sentences >= 1
        assert r.n_words > 0 and r.n_syllables > 0


def test_token_budget_sums_exactly(run):
    rows = run("pipeline_token_budget_allocation")
    assert sum(r.budget_tokens for r in rows) == 1_000_000
    # largest-remainder never moves an allocation by more than 1 from floor
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        fl = (1_000_000 * r.n_tokens) // total
        assert r.budget_tokens in (fl, fl + 1)


def test_fleiss_kappa_bounds(run):
    (r,) = run("eval_fleiss_kappa")
    assert -1.0 <= r.kappa <= 1.0
    assert r.m_ratings >= 2


def test_variance_ratio_positive(run):
    (r,) = run("ts_variance_ratio_test")
    assert r.vr2 > 0


def test_coverage_curve_monotone(run):
    rows = sorted(run("corpus_ngram_coverage_curve"), key=lambda r: r.top_k)
    assert [r.top_k for r in rows] == [8, 64, 512]
    assert rows[0].coverage_ppm <= rows[1].coverage_ppm <= rows[2].coverage_ppm
    assert rows[-1].coverage_ppm <= 1_000_000
