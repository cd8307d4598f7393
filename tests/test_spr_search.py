"""Likelihood SPR search on the schedule-as-data incremental evaluator
(search/spr.py + ops/incremental.py): candidate scores must equal
from-scratch evaluations of the moved topology, the committed move must
improve the likelihood, state must be exactly restorable, and repeated
rounds must trigger ZERO recompilations of the batched scorer."""

import numpy as np
import pytest

import jax.numpy as jnp

import libpll_tpu as pll
from libpll_tpu.search import spr as spr_search
from libpll_tpu.tree import incremental as inc
from libpll_tpu.tree import moves, utree as ut

TIPS, SITES, CATS = 12, 40, 4
PARAMS = [1.1, 2.6, 0.8, 1.3, 2.9, 1.0]
FREQS = [0.28, 0.26, 0.22, 0.24]
ALPHA = 0.8


def _random_tree(tips, rng):
    items = [f"t{i}:{rng.uniform(0.05, 0.4):.4f}" for i in range(tips)]
    while len(items) > 3:
        i, j = sorted(rng.choice(len(items), 2, replace=False))
        b = items.pop(j)
        a = items.pop(i)
        items.append(f"({a},{b}):{rng.uniform(0.05, 0.4):.4f}")
    return f"({items[0]},{items[1]},{items[2]});"


def _simulate(newick, rng):
    """Evolve sequences along the tree under GTR+Γ (signal for search)."""
    from libpll_tpu.models.gtr import eigen_decompose

    tree = ut.parse_newick_string(newick)
    w, left, right = eigen_decompose(np.asarray(PARAMS), np.asarray(FREQS))

    def pmat(t):
        return (left * np.expm1(w * t)) @ right + np.eye(4)

    seqs = {}

    def walk(node, state):
        if node.is_tip:
            seqs[node.label] = state
            return
        for m in list(node.ring())[1:]:
            child = m.back
            P = pmat(max(child.length, 1e-6))
            nxt = np.array([rng.choice(4, p=P[s] / P[s].sum())
                            for s in state])
            walk(child, nxt)

    root = tree.root
    base = rng.choice(4, SITES, p=FREQS)
    for m in root.ring():
        child = m.back
        P = pmat(max(child.length, 1e-6))
        nxt = np.array([rng.choice(4, p=P[s] / P[s].sum()) for s in base])
        walk(child, nxt)
    alpha = "ACGT"
    return {lab: "".join(alpha[s] for s in st) for lab, st in seqs.items()}


def _partition_for(tree, seqs):
    part = pll.Partition(TIPS, TIPS - 2, 4, SITES, 1, 2 * TIPS - 3, CATS,
                         TIPS - 2)
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    for lab, s in seqs.items():
        part.set_tip_states(order[lab], pll.maps.pll_map_nt, s)
    part.set_frequencies(0, FREQS)
    part.set_subst_params(0, PARAMS)
    part.set_category_rates(pll.compute_gamma_cats(ALPHA, CATS))
    return part


def _full_logl(tree, part):
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * CATS, midx, blens)
    part.update_partials(ops)
    r = tree.root
    return part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, [0] * CATS)


def test_candidate_scores_match_bruteforce():
    rng = np.random.default_rng(11)
    newick = _random_tree(TIPS, rng)
    seqs = _simulate(newick, rng)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs)

    candidates = spr_search.spr_neighborhood(tree, radius=4)[:12]
    assert len(candidates) >= 6

    # incremental batched scores
    root = tree.root
    trav = ut.traverse(root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * CATS, midx, blens)
    part.update_partials(ops)
    inc.mark_valid(trav)
    enc, n_max = spr_search.encode_candidates(tree, candidates)
    cap = max(8, 1 << (n_max - 1).bit_length())
    scorer = spr_search.make_round_scorer(part, cap)
    logls = spr_search.score_encoded(tree, part, [0] * CATS, enc, cap, 8,
                                     scorer)

    # every candidate's subset is strictly smaller than the full schedule
    assert n_max < TIPS - 2

    # brute force: fresh partition + full eval of the moved topology
    for (p, r, changed, pops, edge), got in zip(enc, logls):
        rb = moves.Rollback(moves.MOVE_SPR)
        moves.spr(p, r, rollback=rb)
        tree_mv = ut.parse_newick_string(ut.export_newick(tree.root))
        part_mv = _partition_for(tree_mv, seqs)
        want = _full_logl(tree_mv, part_mv)
        moves.rollback_move(rb)  # restore topology for the next candidate
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-8)


def test_spr_round_improves_and_restores():
    rng = np.random.default_rng(23)
    true_newick = _random_tree(TIPS, rng)
    seqs = _simulate(true_newick, rng)

    # start from a different random topology: search should improve
    start_newick = _random_tree(TIPS, np.random.default_rng(99))
    tree = ut.parse_newick_string(start_newick)
    part = _partition_for(tree, seqs)

    res = spr_search.spr_round(tree, part, [0] * CATS, radius=6, batch=16)
    assert res.n_candidates > 10
    assert res.best_logl >= res.logl0

    # committed state must equal a from-scratch evaluation of the new tree
    tree_chk = ut.parse_newick_string(ut.export_newick(tree.root))
    part_chk = _partition_for(tree_chk, seqs)
    want = _full_logl(tree_chk, part_chk)
    np.testing.assert_allclose(res.best_logl, want, atol=1e-8)

    if res.improved:
        assert res.best_logl > res.logl0


def test_spr_rounds_zero_recompiles():
    """Two full rounds (different topologies after the first commit) must
    reuse ONE compiled scorer — the no-recompile property of
    schedule-as-data search."""
    rng = np.random.default_rng(31)
    true_newick = _random_tree(TIPS, rng)
    seqs = _simulate(true_newick, rng)
    tree = ut.parse_newick_string(_random_tree(TIPS,
                                               np.random.default_rng(77)))
    part = _partition_for(tree, seqs)

    cap = 16
    scorer = spr_search.make_round_scorer(part, cap)
    logls_seen = []
    for _ in range(3):
        res = spr_search.spr_round(tree, part, [0] * CATS, radius=6,
                                   capacity=cap, batch=16, scorer=scorer)
        logls_seen.append(res.best_logl)
    assert scorer._cache_size() == 1, "scorer retraced across rounds"
    assert logls_seen[-1] >= logls_seen[0] - 1e-9


def test_spr_round_per_rate_scalers():
    """The incremental candidate scorer under PLL_ATTRIB_RATE_SCALERS:
    per-(site,rate) counters ride the scratch rows and the edge fold."""
    rng = np.random.default_rng(12)
    newick = _random_tree(TIPS, rng)
    seqs = _simulate(newick, rng)
    tree = ut.parse_newick_string(newick)
    part = pll.Partition(TIPS, TIPS - 2, 4, SITES, 1, 2 * TIPS - 3, CATS,
                         TIPS - 2, scaling="rate")
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    for lab, s in seqs.items():
        part.set_tip_states(order[lab], pll.maps.pll_map_nt, s)
    part.set_frequencies(0, FREQS)
    part.set_subst_params(0, PARAMS)
    part.set_category_rates(pll.compute_gamma_cats(ALPHA, CATS))

    res = spr_search.spr_round(tree, part, [0] * CATS, radius=5, batch=8)
    assert res.best_logl >= res.logl0

    # committed state equals a from-scratch (per-site-scaled) evaluation
    tree_chk = ut.parse_newick_string(ut.export_newick(tree.root))
    part_chk = _partition_for(tree_chk, seqs)
    want = _full_logl(tree_chk, part_chk)
    np.testing.assert_allclose(res.best_logl, want, atol=1e-8)


def test_nni_round_matches_bruteforce_and_commits():
    """NNI rounds on the incremental scorer: candidate scores equal
    from-scratch evaluations of the interchanged topology; the committed
    move is consistent."""
    rng = np.random.default_rng(19)
    newick = _random_tree(TIPS, rng)
    seqs = _simulate(newick, rng)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs)

    # baseline + encode + score
    root = tree.root
    trav = ut.traverse(root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * CATS, midx, blens)
    part.update_partials(ops)
    inc.mark_valid(trav)
    cands = spr_search.nni_candidates(tree)
    assert len(cands) >= 2 * (TIPS - 3)
    enc, n_max = spr_search.encode_nni_candidates(tree, cands)
    cap = max(8, 1 << (n_max - 1).bit_length())
    scorer = spr_search.make_round_scorer(part, cap)
    logls = spr_search.score_encoded(tree, part, [0] * CATS, enc, cap, 8,
                                     scorer)
    for (edge, t, changed, pops, ev), got in list(zip(enc, logls))[:8]:
        rb = moves.Rollback(moves.MOVE_NNI)
        moves.nni(edge, t, rollback=rb)
        tree_mv = ut.parse_newick_string(ut.export_newick(tree.root))
        part_mv = _partition_for(tree_mv, seqs)
        want = _full_logl(tree_mv, part_mv)
        moves.rollback_move(rb)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-8)

    # full round: committed state is consistent
    res = spr_search.nni_round(tree, part, [0] * CATS, capacity=cap,
                               scorer=scorer)
    tree_chk = ut.parse_newick_string(ut.export_newick(tree.root))
    part_chk = _partition_for(tree_chk, seqs)
    want = _full_logl(tree_chk, part_chk)
    np.testing.assert_allclose(res.best_logl, want, atol=1e-8)
    assert res.best_logl >= res.logl0


def test_spr_round_multi_commit():
    """commit > 1 harvests several verified non-overlapping moves in one
    scored round: the composite logL must beat the single-commit round,
    state must be exactly consistent with a from-scratch evaluation, and
    the tree must stay structurally valid."""
    rng = np.random.default_rng(23)
    newick = _random_tree(TIPS, rng)
    seqs = _simulate(newick, rng)

    tree1 = ut.parse_newick_string(newick)
    part1 = _partition_for(tree1, seqs)
    res1 = spr_search.spr_round(tree1, part1, [0] * CATS, radius=6,
                                commit=1, min_delta=1e-9)

    tree4 = ut.parse_newick_string(newick)
    part4 = _partition_for(tree4, seqs)
    res4 = spr_search.spr_round(tree4, part4, [0] * CATS, radius=6,
                                commit=4, min_delta=1e-9)

    assert res1.improved and res4.improved
    assert res4.best_logl >= res1.best_logl - 1e-9, (res1.best_logl,
                                                     res4.best_logl)
    assert len(res4.best_nodes) >= 2  # at least the top move
    # monotone vs the starting tree
    assert res4.best_logl > res4.logl0

    # exact consistency: from-scratch re-evaluation of the mutated tree
    tree_chk = ut.parse_newick_string(ut.export_newick(tree4.root))
    assert ut.check_integrity(tree_chk)
    part_chk = _partition_for(tree_chk, seqs)
    want = _full_logl(tree_chk, part_chk)
    np.testing.assert_allclose(res4.best_logl, want, atol=1e-6)

    # the partition state left behind is also exactly consistent
    got = _full_logl(tree4, part4)
    np.testing.assert_allclose(got, want, atol=1e-6)
