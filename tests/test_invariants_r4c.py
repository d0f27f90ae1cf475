"""Mathematical invariants of the round-4-continuation operators.

The DuckDB differential proves Spark == oracle; these tests prove both are
RIGHT, by checking properties the statistics must satisfy regardless of
fixture content — bounds, monotonicity, prefix structure, exact budget
conservation. A differential can't catch an error present in both
implementations; an invariant can.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def go(key):
        return QUERIES[key](spark, sf_dir).collect()

    return go


def test_auc_fraction_bounds(run):
    [r] = run("eval_auc_rank")
    assert 0 < r.auc_den2
    assert 0 <= r.auc_num2 <= r.auc_den2  # AUC ∈ [0, 1]
    assert r.auc_den2 == 2 * r.n_pos * r.n_neg


def test_psi_nonnegative(run):
    # PSI is an f-divergence: ≥ 0, = 0 only for identical histograms
    [r] = run("stats_psi_drift")
    assert r.psi_r6 >= 0


def test_mutual_information_nonnegative(run):
    [r] = run("stats_mutual_information")
    assert r.mi_r6 >= 0  # MI ≥ 0 always
    assert r.n_cells <= 20  # |event_type| × |bucket| = 5 × 4


def test_bh_rejections_are_rank_prefix(run):
    rows = run("stats_bh_fdr")
    assert len(rows) == 25
    by_rank = sorted(rows, key=lambda r: r.bh_rank)
    flags = [r.rejected for r in by_rank]
    # BH step-up rejects ranks 1..k — never a gap
    assert flags == sorted(flags, reverse=True)
    # p-value numerators ∈ [1, B+1]
    assert all(1 <= r.p_num <= 25 for r in rows)


def test_prefix_join_pairs_above_threshold(run):
    rows = run("join_set_similarity_prefix")
    assert rows, "fixture contains near-duplicate docs"
    for r in rows:
        assert r.a_id < r.b_id
        assert 0 < r.inter <= r.uni
        assert 10 * r.inter >= 8 * r.uni  # Jaccard ≥ 0.8 exactly


def test_sax_words_cover_all_days(run):
    rows = run("ts_sax_symbolic")
    assert sum(r.days for r in rows) == 30  # January fixture
    for r in rows:
        assert len(r.sax_word) == r.days
        assert set(r.sax_word) <= set("abcd")


def test_wl_color_counts_nondecreasing(run):
    rows = sorted(run("graph_wl_refinement"), key=lambda r: r.round)
    # refinement only ever SPLITS color classes
    assert rows[0].n_colors <= rows[1].n_colors <= rows[2].n_colors
    assert len({r.n_nodes for r in rows}) == 1  # node set is stable


def test_err_within_normalizer(run):
    rows = run("search_err_eval")
    for r in rows:
        assert 0 <= r.err_num <= r.err_den
        assert r.err_den == 2520 * 1024


def test_kappa_bounds(run):
    [r] = run("stats_cohens_kappa")
    assert r.kappa_den > 0
    assert -r.kappa_den <= r.kappa_num <= r.kappa_den  # κ ∈ [−1, 1]
    assert abs(r.kappa_micro) <= 1_000_000


def test_rank_correlations_bounded(run):
    [sp] = run("stats_spearman_daily")
    assert abs(sp.rho_micro) <= 1_000_000
    [kt] = run("ts_kendall_tau_daily")
    assert kt.n_c + kt.n_d <= kt.n * (kt.n - 1) // 2
    assert abs(kt.tau_micro) <= 1_000_000


def test_rich_club_monotone_density_domain(run):
    rows = sorted(run("graph_rich_club"), key=lambda r: r.k)
    for r in rows:
        assert 0 <= r.m_k
        if r.n_k >= 2:
            assert r.phi_bp <= 10_000  # a density ≤ 1


def test_brier_mcnemar_domains(run):
    [b] = run("eval_brier_score")
    assert 0 <= b.brier_mean_micro2 <= 10**12  # mean (p−y)² with p,y ≤ 1e6
    [m] = run("eval_mcnemar_paired")
    assert m.b + m.c <= m.n


def test_hhi_between_1_over_k_and_1(run):
    [r] = run("agg_herfindahl_hhi")
    assert r.hhi_num * r.n_groups >= r.hhi_den  # HHI ≥ 1/k
    assert r.hhi_num <= r.hhi_den  # HHI ≤ 1


def test_t_closeness_emd_bounds(run):
    rows = run("privacy_t_closeness")
    for r in rows:
        assert 0 <= r.emd_num <= r.emd_den


def test_fbeta_f1_between_p_and_r(run):
    rows = run("eval_fbeta_threshold_sweep")
    assert len(rows) == 6
    for r in rows:
        lo, hi = sorted((r.precision_micro, r.recall_micro))
        if r.tp > 0:
            # harmonic mean lies between P and R (integer truncation slack 1)
            assert lo - 1 <= r.f1_micro <= hi + 1


def test_drawdown_nonnegative_below_peak(run):
    [r] = run("ts_max_drawdown")
    assert 0 <= r.drawdown_cents <= r.peak_cents
    assert 0 <= r.drawdown_bp <= 10_000


def test_neyman_allocation_conserves_budget(run):
    rows = run("sample_neyman_allocation")
    assert sum(r.alloc for r in rows) == 100  # largest-remainder exactness
    assert all(r.alloc >= 0 for r in rows)


def test_condorcet_scores_bounded_by_duels(run):
    rows = run("search_fusion_condorcet")
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.copeland  # wins ≤ candidates − 1, checked loosely


def test_pareto_lorenz_consistency(run):
    [p] = run("agg_pareto_8020")
    assert 1 <= p.n_top <= p.n_customers
    lorenz = sorted(run("agg_lorenz_deciles"), key=lambda r: r.decile)
    shares = [r.cum_share_micro for r in lorenz]
    assert shares == sorted(shares)  # Lorenz curve is nondecreasing
    assert shares[-1] == 1_000_000  # ends at 100%
    assert sum(r.n_customers for r in lorenz) == p.n_customers


def test_modularity_bounds(run):
    [r] = run("graph_modularity_nation")
    assert -r.q_den <= r.q_num <= r.q_den  # Q ∈ (−1, 1)


def test_cochran_friedman_nonnegative(run):
    [c] = run("stats_cochran_q")
    assert c.q_micro >= 0
    [f] = run("stats_friedman_test")
    assert f.q_micro >= 0
    assert f.n <= 31  # complete January day blocks


def test_rbo_within_normalizer(run):
    [r] = run("search_rbo_overlap")
    assert 0 <= r.rbo_num <= r.rbo_den
    assert r.rbo_den == 2520 * 1023


def test_seasonality_strength_bounded_above(run):
    rows = run("ts_seasonality_strength")
    for r in rows:
        assert r.strength_micro <= 1_000_000  # F_s ≤ 1 (can dip < 0 on flat)


def test_sprt_decision_consistent_with_llr(run):
    [r] = run("ab_sequential_sprt")
    assert r.decision in (-1, 0, 1)
    if r.decision == 0:
        assert r.decision_day == "none"


def test_brown_forsythe_ss_partition(run):
    [r] = run("stats_brown_forsythe")
    # integer-floor group terms can push SSB below 0 by at most k
    assert r.ssb >= -r.k
    assert r.ssw >= 0
    assert r.f_micro >= 0


def test_span_corruption_masks_consistent(run):
    rows = run("pipeline_span_corruption_mask")
    assert len(rows) == 21
    for r in rows:
        assert 0 <= r.n_masked <= r.n_tokens
        # every masked token lands in targets (whitespace-joined)
        n_target_tokens = len(r.targets.split()) if r.targets else 0
        assert n_target_tokens == r.n_masked
        # sentinels appear iff something was masked
        assert ("<X>" in r.masked_text) == (r.n_masked > 0)


def test_soft_weights_conserve_unit_mass_per_cluster(run):
    [r] = run("dedup_soft_weights")
    assert r.n_docs == 500
    # each cluster contributes ≈ 1e6 (floor division loses < csz per cluster)
    assert r.total_weight_micro <= 500 * 1_000_000
    assert r.total_weight_micro > 400 * 1_000_000


def test_kl_divergence_nonnegative(run):
    [r] = run("mixture_kl_divergence")
    assert r.kl_r6 >= 0


def test_pass_at_k_bounds(run):
    [r] = run("eval_pass_at_k")
    assert 0 <= r.pass_at_3_micro <= 1_000_000
    assert r.n_scored <= r.n_tasks


def test_smoothed_rate_shrinks_toward_half(run):
    rows = run("agg_bayes_smoothed_rate")
    for r in rows:
        raw, sm = r.raw_rate_micro, r.smoothed_rate_micro
        # posterior mean lies between the raw rate and the prior mean 0.5
        lo, hi = sorted((raw, 500_000))
        assert lo - 1 <= sm <= hi + 1


def test_wilson_below_point_estimate(run):
    rows = run("rank_wilson_lower_bound")
    for r in rows:
        assert 0.0 <= r.wilson_lb_r6 <= r.s / r.n + 1e-9


def test_ljung_box_nonnegative(run):
    rows = run("ts_ljung_box")
    for r in rows:
        assert r.q_micro2 >= 0
        assert r.autocorrelated in (0, 1)
