"""Shape replicas of the two remaining fixture-bound reference programs
(their committed fixtures are downloaded at reference-test time and absent
offline, so these rebuild the *loops* at scale on synthetic data with the
compiled oracle as truth):

* ``partial-traversal.c`` (reference test/src/partial-traversal.c:24-40):
  twenty rounds of randomized CLV re-orientation — pick a random inner
  node/direction, run a partial post-order traversal gated on the
  per-direction ``clv_valid`` flags, Felsenstein-update only the
  invalidated CLVs, and evaluate the edge log-likelihood at that node.
  Every round must reproduce the oracle's full-traversal logL exactly;
  this is the validity-flag machinery (tree/incremental.py) the whole SPR
  fast path leans on, stressed at 24 and 96 taxa instead of the tiny
  synthetic cases of test_incremental.py.

* ``rooted.c`` / ``rooted-tipinner.c`` (test/src/rooted.c:13,239-272):
  the proportion-of-invariant-sites sweep on a rooted tree — p-inv over
  0.0–0.9, P-matrices and partials refreshed per step, root logL diffed
  against the oracle — at 200 taxa with planted constant columns.
"""

import numpy as np
import pytest

import libpll_tpu as pll
import oracle
from libpll_tpu.io import maps
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.tree import incremental as inc
from libpll_tpu.tree import rtree as rt
from libpll_tpu.tree import utree as ut

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

CATS = 4
DNA = list("ACGT")


def _random_utree_newick(tips, rng):
    items = [f"t{i}:{rng.uniform(0.02, 0.6):.5f}" for i in range(tips)]
    while len(items) > 3:
        i, j = sorted(rng.choice(len(items), 2, replace=False))
        b = items.pop(j)
        a = items.pop(i)
        items.append(f"({a},{b}):{rng.uniform(0.02, 0.6):.5f}")
    return f"({items[0]},{items[1]},{items[2]});"


def _random_rtree_newick(tips, rng):
    items = [f"t{i}:{rng.uniform(0.02, 0.6):.5f}" for i in range(tips)]
    while len(items) > 2:
        i, j = sorted(rng.choice(len(items), 2, replace=False))
        b = items.pop(j)
        a = items.pop(i)
        items.append(f"({a},{b}):{rng.uniform(0.02, 0.6):.5f}")
    return f"({items[0]},{items[1]});"


def _model_params(rng):
    params = rng.uniform(0.2, 3.0, 6)
    freqs = rng.uniform(0.1, 1.0, 4)
    freqs /= freqs.sum()
    rates = compute_gamma_cats(rng.uniform(0.4, 1.5), CATS)
    return params, freqs, rates


def _seqs(labels, sites, rng, const_prefix=""):
    out = {}
    for lab in labels:
        out[lab] = const_prefix + "".join(
            rng.choice(DNA, sites - len(const_prefix)))
    return out


# ---------------------------------------------------------------------------
# partial-traversal.c at shape
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("tips,sites", [(24, 300), (96, 200)])
def test_random_clv_orientation_stress(tips, sites):
    rng = np.random.default_rng(tips)
    newick = _random_utree_newick(tips, rng)
    tree = ut.parse_newick_string(newick)
    params, freqs, rates = _model_params(rng)
    seqs = _seqs([f"t{i}" for i in range(tips)], sites, rng)

    inner = tips - 2
    n_branches = 2 * tips - 3
    mine = pll.Partition(tips, inner, 4, sites, 1, n_branches, CATS, inner)
    ref = oracle.RefPartition(tips, inner, 4, sites, 1, n_branches, CATS,
                              inner)
    nt = oracle.map_table("pll_map_nt")
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    for lab, s in seqs.items():
        mine.set_tip_states(order[lab], maps.pll_map_nt, s)
        ref.set_tip_states(order[lab], nt, s)
    for part in (mine, ref):
        part.set_frequencies(0, freqs)
        part.set_subst_params(0, params)
        part.set_category_rates(rates)
    pidx = [0] * CATS

    # oracle truth: one full traversal + root-edge logL
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    ref.update_prob_matrices(pidx, midx, blens)
    ref.update_partials([op.as_tuple() for op in ops])
    r = tree.root
    want = ref.edge_loglikelihood(r.clv_index, r.scaler_index,
                                  r.back.clv_index, r.back.scaler_index,
                                  r.pmatrix_index, pidx)

    # our side: all P-matrices once (branch lengths never change), then
    # twenty rounds of random re-orientation with partial updates only
    mine.update_prob_matrices(pidx, midx, blens)
    inner_nodes = [n for n in trav if not n.is_tip]
    assert len(inner_nodes) == inner

    total_ops = 0
    partial_rounds = 0
    for it in range(20):
        node = inner_nodes[rng.integers(0, inner)]
        for _ in range(rng.integers(0, 3)):  # random ring direction
            node = node.next
        dirty = inc.partial_traverse(node)
        pops = inc.create_partial_operations(dirty)
        if pops:
            mine.update_partials(pops)
        total_ops += len(pops)
        if 0 < len(pops) < inner:
            partial_rounds += 1
        got = mine.compute_edge_loglikelihood(
            node.clv_index, node.scaler_index, node.back.clv_index,
            node.back.scaler_index, node.pmatrix_index, pidx)
        np.testing.assert_allclose(got, want, rtol=1e-10,
                                   err_msg=f"round {it}")

    # the flags must actually prune work: strictly fewer ops than 20 full
    # traversals, and several genuinely partial rounds
    assert total_ops < 20 * inner
    assert partial_rounds >= 5


def test_orientation_flags_catch_stale_clvs():
    """Negative control: if the validity flags wrongly claimed a flipped
    CLV was fresh, the stress loop above would silently pass on a chain
    topology.  Corrupt one inner CLV, verify the next partial traversal
    that covers it repairs the logL (i.e. the flags force recompute after
    invalidation)."""
    rng = np.random.default_rng(7)
    tips, sites = 12, 80
    tree = ut.parse_newick_string(_random_utree_newick(tips, rng))
    params, freqs, rates = _model_params(rng)
    seqs = _seqs([f"t{i}" for i in range(tips)], sites, rng)
    inner = tips - 2
    mine = pll.Partition(tips, inner, 4, sites, 1, 2 * tips - 3, CATS,
                         inner)
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    for lab, s in seqs.items():
        mine.set_tip_states(order[lab], maps.pll_map_nt, s)
    mine.set_frequencies(0, freqs)
    mine.set_subst_params(0, params)
    mine.set_category_rates(rates)
    pidx = [0] * CATS

    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    mine.update_prob_matrices(pidx, midx, blens)
    mine.update_partials(ops)
    inc.mark_valid(trav)
    r = tree.root
    want = mine.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index,
        r.back.scaler_index, r.pmatrix_index, pidx)

    # corrupt the evaluation edge's parent CLV and invalidate it
    victim = r
    mine.clv = mine.clv.at[victim.clv_index].mul(3.0)
    bad = mine.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index,
        r.back.scaler_index, r.pmatrix_index, pidx)
    assert abs(bad - want) > 1e-6  # the corruption is visible
    inc.invalidate(victim)

    dirty = inc.partial_traverse(r)
    pops = inc.create_partial_operations(dirty)
    assert pops  # the invalidation forced work
    mine.update_partials(pops)
    got = mine.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index,
        r.back.scaler_index, r.pmatrix_index, pidx)
    np.testing.assert_allclose(got, want, rtol=1e-10)


# ---------------------------------------------------------------------------
# rooted.c p-inv sweep at shape
# ---------------------------------------------------------------------------
def test_rooted_pinv_sweep_200_taxa():
    rng = np.random.default_rng(200)
    tips, sites = 200, 300
    newick = _random_rtree_newick(tips, rng)
    tree = rt.parse_newick_string(newick)
    params, freqs, rates = _model_params(rng)
    # plant constant columns so every p-inv point has invariant signal
    seqs = _seqs([f"t{i}" for i in range(tips)], sites, rng,
                 const_prefix="ACGTAACC")

    inner = tips - 1
    n_branches = 2 * tips - 2
    mine = pll.Partition(tips, inner, 4, sites, 1, n_branches, CATS, inner)
    ref = oracle.RefPartition(tips, inner, 4, sites, 1, n_branches, CATS,
                              inner)
    nt = oracle.map_table("pll_map_nt")
    trav = rt.traverse(tree.root)
    order = {n.label: n.clv_index for n in trav if n.is_tip}
    for lab, s in seqs.items():
        mine.set_tip_states(order[lab], maps.pll_map_nt, s)
        ref.set_tip_states(order[lab], nt, s)
    for part in (mine, ref):
        part.set_frequencies(0, freqs)
        part.set_subst_params(0, params)
        part.set_category_rates(rates)
    pidx = [0] * CATS

    ops, blens, midx = rt.create_operations(trav)
    root = tree.root
    logls = []
    for pinv in np.arange(0.0, 0.91, 0.1):
        ref.set_invariant_proportion(0, float(pinv))
        mine.update_invariant_sites_proportion(0, float(pinv))
        # P-matrices depend on 1/(1-pinv): refresh, then full partials
        ref.update_prob_matrices(pidx, midx, blens)
        mine.update_prob_matrices(pidx, midx, blens)
        ref.update_partials([op.as_tuple() for op in ops])
        mine.update_partials(ops)
        want = ref.root_loglikelihood(root.clv_index, root.scaler_index,
                                      pidx)
        got = mine.compute_root_loglikelihood(root.clv_index,
                                              root.scaler_index, pidx)
        np.testing.assert_allclose(got, want, rtol=1e-10,
                                   err_msg=f"pinv={pinv:.1f}")
        logls.append(float(got))
    # at 200 random-data taxa heavy scaling is active and the sweep spans
    # a wide logL range; the values must be distinct (the sweep bites)
    assert len({round(v, 3) for v in logls}) == len(logls)
