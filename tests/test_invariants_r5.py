"""Mathematical invariants for the OLDER operator families (round-5).

Round 4 introduced invariant tests for its own 38 new operators
(test_invariants_r4c.py); the round-4 verdict asked for the same
both-engines-wrong-proof treatment of the highest-risk older families —
rank-identity evals (NDCG/MRR/RRF/BM25), dedup recall bits, sketch and
quantization error bounds, funnel/decile/fertility structure. The DuckDB
differential proves Spark == oracle; these prove both are RIGHT: each
assertion is a property the mathematics forces regardless of fixture
content, so a bug present in BOTH implementations still fails here.
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


# --- rank-identity evals ---------------------------------------------------


def test_ndcg_identity_and_bounds(run):
    rows = run("search_ndcg_eval")
    assert rows
    idcgs = {r.idcg_micro for r in rows}
    assert len(idcgs) == 1  # ideal DCG is query-independent at fixed k
    for r in rows:
        assert 0 <= r.dcg_micro <= r.idcg_micro  # DCG never beats ideal
        # NDCG is exactly the integer ratio, in micro-units
        assert r.ndcg_micro == r.dcg_micro * 1_000_000 // r.idcg_micro
        if r.n_rel_at_k == 0:
            assert r.dcg_micro == 0


def test_mrr_reciprocal_identity(run):
    rows = run("search_mrr_eval")
    assert rows
    for r in rows:
        if r.first_rel_rank == 0:  # no relevant doc retrieved
            assert r.rr_micro == 0
        else:
            assert r.rr_micro == 1_000_000 // r.first_rel_rank
            assert 1 <= r.first_rel_rank


def test_rrf_score_is_sum_of_components(run):
    from c2_duckdb_runner_spark.operators.attribution_retrieval_ext import (
        _RRF_K,
    )

    rows = run("search_rrf_fusion")
    assert rows
    for r in rows:
        want = 0
        if r.rank_lex > 0:
            want += 1_000_000 // (_RRF_K + r.rank_lex)
        if r.rank_len > 0:
            want += 1_000_000 // (_RRF_K + r.rank_len)
        assert r.rrf_micro == want, r


def test_bm25_topk_ordered_and_positive(run):
    rows = run("search_bm25_topk")
    assert rows
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)  # a top-k IS ordered
    # BM25 with the +1-smoothed idf is strictly positive for matching docs
    assert all(s > 0 for s in scores)
    assert all(r.n_terms >= 1 for r in rows)


def test_err_cascade_within_normalizer(run):
    rows = run("search_err_eval")
    assert rows
    dens = {r.err_den for r in rows}
    assert len(dens) == 1 and dens.pop() > 0
    for r in rows:
        assert 0 <= r.err_num <= r.err_den  # ERR ∈ [0, 1]
        if r.n_rel_at_k == 0:
            assert r.err_num == 0


# --- similarity search / embeddings ---------------------------------------


def test_bruteforce_cosine_bounds_and_order(run):
    rows = run("simsearch_topk_bruteforce")
    assert rows
    cs = [r.cos for r in rows]
    assert cs == sorted(cs, reverse=True)
    assert all(-1.0 - 1e-9 <= c <= 1.0 + 1e-9 for c in cs)


def test_ivf_multiprobe_never_beats_bruteforce(run):
    brute = run("simsearch_topk_bruteforce")
    probed = run("simsearch_ivf_multiprobe")
    assert brute and probed
    best = max(r.cos for r in brute)
    # an ANN candidate set is a SUBSET of the corpus: its best score can
    # never exceed the exhaustive best
    assert all(r.cos <= best + 1e-9 for r in probed)


def test_int8_quantization_error_bound(run):
    rows = run("embed_quantize_int8")
    assert rows
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.codes)  # symmetric int8
        # round-to-nearest: per-coordinate error ≤ scale/2, so the L2
        # reconstruction error over d=64 dims is ≤ scale·√64/2 = 4·scale
        assert 0 <= r.recon_err <= 4.0 * r.scale + 1e-9, r


def test_hll_union_within_declared_rsd(run):
    rows = run("agg_hll_sketch_union")
    assert rows
    assert all(r.within_rsd == 1 for r in rows)


# --- dedup recall bits ------------------------------------------------------


def test_lsh_and_simhash_recall_verdicts(run):
    [m] = run("dedup_minhash_lsh")
    assert m.n_true_pairs > 0 and m.recall_ok == 1
    [s] = run("dedup_simhash")
    assert s.n_true_pairs > 0 and s.recall_ok == 1


def test_cc_component_is_min_id_and_rooted(run):
    rows = run("dedup_cluster_cc")
    assert rows
    comp = {r.doc_id: r.component_id for r in rows}
    for doc, c in comp.items():
        assert c <= doc  # min-id labeling convention
        assert comp.get(c) == c  # every component's root labels itself


# --- pipeline structure ------------------------------------------------------


def test_funnel_counts_monotone(run):
    [r] = run("funnel_view_click_purchase")
    assert r.n_view >= r.n_click_after_view >= r.n_purchase_after_click >= 0
    assert r.n_users >= r.n_view >= 0 or r.n_users == r.n_view
    if r.n_purchase_after_click == 0:
        assert r.total_convert_ms == 0


def test_decile_lift_table_structure(run):
    rows = sorted(run("eval_decile_lift_table"), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    sizes = [r.n for r in rows]
    # deciles come from the distinct-value-histogram cut (ties never split
    # across deciles), so balance holds up to the largest tie group
    expected = sum(sizes) / len(sizes)
    assert all(abs(s - expected) <= max(4, 0.1 * expected) for s in sizes)
    caps = [r.capture_micro for r in rows]
    assert caps == sorted(caps)  # cumulative capture is nondecreasing
    assert caps[-1] >= 999_000  # last decile captures ~everything
    assert all(r.positives >= 0 for r in rows)


def test_grouping_sets_totals_reconcile(run):
    rows = run("agg_grouping_sets")
    by_status = sum(
        r.n for r in rows if r.o_orderstatus is not None and r.o_orderpriority is None
    )
    by_prio = sum(
        r.n for r in rows if r.o_orderstatus is None and r.o_orderpriority is not None
    )
    # both grouping sets partition the same relation: totals must agree
    assert by_status == by_prio > 0


def test_fertility_is_exact_ratio(run):
    rows = run("tokenizer_fertility_by_lang")
    assert rows
    for r in rows:
        assert r.total_tokens > 0
        assert r.chars_per_token_milli == 1000 * r.total_chars // r.total_tokens
        assert r.n_docs > 0


def test_gopher_quality_ratio_bounds(run):
    rows = run("text_gopher_quality")
    assert rows
    for r in rows:
        assert 0.0 <= r.frac_alpha_words <= 1.0
        assert 0.0 <= r.symbol_ratio
        assert r.n_words >= 0 and r.n_stop_distinct >= 0
    assert any(r.passes for r in rows) and any(not r.passes for r in rows)


def test_ntile_histogram_buckets_balanced(run):
    rows = run("window_ntile_histogram")
    assert rows
    sizes = [0] * 5
    for r in rows:
        assert 1 <= r.quartile <= 4
        sizes[r.quartile] += 1
    assert max(sizes[1:]) - min(sizes[1:]) <= 1  # NTILE balance law
    # earlier buckets are never smaller than later ones
    assert sizes[1] >= sizes[2] >= sizes[3] >= sizes[4]


def test_basket_lift_identities(run):
    rows = run("agg_basket_affinity_lift")
    assert rows
    for r in rows:
        assert r.b1 != r.b2
        assert r.sxy >= 1
        assert 0 < r.conf_micro <= 1_000_000  # confidence is a probability
        assert r.lift_micro > 0


# --- statistical tests -------------------------------------------------------


def test_chi2_nonnegative(run):
    [r] = run("stats_chi2_drift")
    assert r.chi2_micro >= 0
    assert r.drift in (0, 1)
    assert r.n_bins >= 1


def test_permutation_counts_bounded(run):
    [r] = run("stats_permutation_test")
    assert 0 <= r.n_extreme <= r.n_perms
    assert r.signif in (0, 1)
    assert r.n > 0


def test_mann_kendall_s_within_pair_count(run):
    rows = run("ts_mann_kendall_trend")
    assert rows
    for r in rows:
        max_s = r.n_points * (r.n_points - 1) // 2
        assert -max_s <= r.s_stat <= max_s
        if r.trend == "up":
            assert r.s_stat > 0
        elif r.trend == "down":
            assert r.s_stat < 0


def test_theil_sen_pairs_and_sign(run):
    rows = run("ts_theil_sen_slope")
    assert rows
    for r in rows:
        # n_pairs is C(n,2) for some integer n — verify it's triangular
        n = int((1 + (1 + 8 * r.n_pairs) ** 0.5) / 2)
        assert n * (n - 1) // 2 == r.n_pairs
        if r.trend == "up":
            assert r.sen_slope_micro > 0
        elif r.trend == "down":
            assert r.sen_slope_micro < 0


def test_kcore_survivors_meet_degree_floor(run):
    from c2_duckdb_runner_spark.operators.structure_ext import _KCORE_K

    rows = run("graph_kcore_peel")
    assert rows
    # at the fixture's size the 4-round peel converges, so every survivor
    # keeps ≥ k neighbors among survivors
    assert min(r.deg for r in rows) >= _KCORE_K


def test_sessionize_sequences_contiguous(run):
    rows = run("sessionize_batch")
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r.start_ms <= r.end_ms
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r.session_seq)
    for seqs in by_user.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_cms_one_sided_error(run):
    rows = run("sketch_count_min_estimate")
    assert rows
    # the count-min law: a point estimate NEVER undercounts
    assert all(r.over_ok == 1 and r.cms_estimate >= r.exact_count for r in rows)


def test_borda_bounds_and_membership(run):
    from c2_duckdb_runner_spark.operators.round5_ext import _BORDA_DEPTH

    rows = run("search_fusion_borda")
    assert rows
    for r in rows:
        assert 1 <= r.borda <= 3 * _BORDA_DEPTH  # ≤ k points per list
        # score must equal the positional identity from the listed ranks
        want = sum(
            _BORDA_DEPTH + 1 - rk
            for rk in (r.r1, r.r2, r.r3)
            if rk <= _BORDA_DEPTH
        )
        assert r.borda == want


def test_pack_sequences_accounting(run):
    from c2_duckdb_runner_spark.operators.round5_ext import _PACK_CTX

    rows = run("pipeline_pack_sequences")
    assert rows
    for r in rows:
        # chunk accounting: chunks·ctx = tokens + tail waste, exactly
        assert r.n_chunks * _PACK_CTX == r.total_tokens + r.tail_waste
        assert 0 <= r.tail_waste < _PACK_CTX
        # a doc can straddle at most every boundary: straddlers < chunks
        assert 0 <= r.n_straddlers < r.n_chunks


def test_bradley_terry_conservation(run):
    rows = run("eval_bradley_terry_rounds")
    assert rows
    total_wins = sum(r.n_wins for r in rows)
    total_matches = sum(r.n_matches for r in rows)
    # every match has exactly one winner and two participants
    assert total_matches == 2 * total_wins
    for r in rows:
        assert 0 <= r.n_wins <= r.n_matches
        assert 0 <= r.bt_micro_r1 <= 2_000_000  # 2·win-rate ∈ [0, 2]
        assert r.bt_micro_r2 >= 0


def test_hits_normalization_and_top(run):
    rows = run("graph_hits_rounds")
    assert rows
    scores = [r.auth_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(0 <= s <= 1_000_000 for s in scores)  # L∞-normalized
    # ordering is by score desc, so row 0 IS the global max = exactly 10⁶
    assert scores[0] == 1_000_000
    assert all(r.indeg >= 1 for r in rows)


def test_ppr_ranks_ordered_and_nonneg(run):
    rows = run("graph_ppr_seed_teleport")
    assert rows
    rs = [r.rank_micros for r in rows]
    assert rs == sorted(rs, reverse=True)
    assert all(r.rank_micros >= 0 for r in rows)
    assert all(r.is_seed in (0, 1) for r in rows)
    assert rs[0] > 0  # mass reaches the graph from the seed set


def test_conditional_entropy_chain_rule(run):
    import math

    [r] = run("stats_conditional_entropy")
    # conditioning never increases entropy: 0 ≤ H(Y|X) ≤ H(Y) ≤ ln|Y|
    assert 0.0 <= r.h_cond_r6 <= r.h_marginal_r6 + 1e-6
    assert r.h_marginal_r6 <= math.log(r.n_cells) + 1e-6
    assert r.n_trans > 0


def test_moe_balance_identities(run):
    rows = run("pipeline_moe_balance_round")
    assert len(rows) == 16  # full expert spine, dead experts included
    caps = {r.capacity for r in rows}
    assert len(caps) == 1
    cap = caps.pop()
    total = sum(r.load for r in rows)
    assert total > 0 and cap >= (total + 15) // 16 - 1
    for r in rows:
        assert r.overflow == max(r.load - cap, 0)
        if r.load > cap:
            assert r.bias_update_milli < 0  # overloaded expert biased down
        elif r.load < cap:
            assert r.bias_update_milli > 0
        else:
            assert r.bias_update_milli == 0


def test_oph_calibration_and_bounds(run):
    from c2_duckdb_runner_spark.operators.round5c_ext import _OPH_K

    rows = run("dedup_minhash_oph")
    assert rows, "sample contains ground-truth near-dup pairs"
    for r in rows:
        assert 0 <= r.slots_match <= _OPH_K
        assert r.calib_ok == 1  # |slots/k − jaccard| within declared bound
        assert r.jac >= 0.8


def test_kruskal_wallis_identities(run):
    [r] = run("stats_kruskal_wallis")
    assert r.n_total > 0 and r.k_groups >= 2
    assert r.tie_correction >= 0
    assert r.h_uncorrected_micro >= 0
    # tie correction divides by ≤ 1: corrected H never shrinks
    assert r.h_micro_corr >= r.h_uncorrected_micro
    assert r.signif in (0, 1)


def test_average_precision_bounds_and_mrr_consistency(run):
    rows = run("eval_average_precision")
    assert rows
    ap_by_q = {}
    for r in rows:
        assert 0 <= r.ap_micro <= 1_000_000  # AP is a mean of precisions
        if r.n_rel_at_k == 0:
            assert r.ap_micro == 0
        ap_by_q[r.q_id] = r.n_rel_at_k
    # same harness as MRR: a query has a first hit iff it has any hit
    mrr = {r.q_id: r.first_rel_rank for r in run("search_mrr_eval")}
    for q, nrel in ap_by_q.items():
        assert (nrel > 0) == (mrr[q] > 0), (q, nrel, mrr[q])


def test_pq_adc_sorted_nonnegative(run):
    rows = run("simsearch_pq_adc")
    assert rows
    ds = [r.adc_dist2_r6 for r in rows]
    assert ds == sorted(ds)  # nearest-first
    assert all(d >= 0 for d in ds)  # sums of squared distances


def test_ttr_bounds_and_hapax_subset(run):
    rows = run("text_type_token_ratio")
    assert rows
    for r in rows:
        assert 1 <= r.n_types <= r.n_tokens
        assert 0 <= r.n_hapax <= r.n_types  # hapaxes are a subset of types
        assert 0 < r.ttr_micro <= 1_000_000
        assert 0 <= r.hapax_frac_micro <= 1_000_000


def test_recall_at_k_bounds_and_ap_consistency(run):
    from c2_duckdb_runner_spark.operators.round5e_ext import _RK_DEPTH

    rows = run("eval_recall_at_k")
    assert rows
    ap = {r.q_id: r.n_rel_at_k for r in run("eval_average_precision")}
    for r in rows:
        assert 0 <= r.n_rel_at_k <= min(_RK_DEPTH, r.n_corpus_rel)
        assert 0 <= r.recall_micro <= 1_000_000
        # identical harness: retrieved-relevant counts must agree with AP's
        assert r.n_rel_at_k == ap[r.q_id]
