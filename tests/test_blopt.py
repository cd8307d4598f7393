"""Full-tree branch-length optimization (engine/blopt.py): the logL must
improve monotonically over perturbed branch lengths, and the optimized
lengths must match an oracle-driven Newton loop (reference
examples/newton/newton.c pattern applied over all edges)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

import libpll_tpu as pll
from libpll_tpu.engine import blopt
from libpll_tpu.tree import utree as ut

from test_spr_search import (_partition_for, _random_tree, _simulate,
                             _full_logl, TIPS, CATS)


def _setup(seed=3, perturb=2.5):
    rng = np.random.default_rng(seed)
    newick = _random_tree(TIPS, rng)
    seqs = _simulate(newick, rng)
    tree = ut.parse_newick_string(newick)
    # perturb every branch length away from the data-generating values
    for n in tree.nodes:
        ring = [n] if n.is_tip else list(n.ring())
        for m in ring:
            m.length = m.length * perturb
    # re-sync paired lengths
    for n in tree.nodes:
        ring = [n] if n.is_tip else list(n.ring())
        for m in ring:
            m.back.length = m.length
    part = _partition_for(tree, seqs)
    return tree, part, seqs


def test_blopt_improves_monotonically():
    tree, part, seqs = _setup()
    logl0 = _full_logl(tree, part)
    logl, sweeps = blopt.optimize_branch_lengths(tree, part, [0] * CATS,
                                                 max_sweeps=4)
    assert logl > logl0 + 1.0, (logl0, logl)

    # optimized state is consistent: from-scratch eval of the same tree
    tree_chk = ut.parse_newick_string(ut.export_newick(tree.root))
    part_chk = _partition_for(tree_chk, seqs)
    want = _full_logl(tree_chk, part_chk)
    np.testing.assert_allclose(logl, want, atol=1e-7)

    # running again from the optimum changes (almost) nothing
    logl2, _ = blopt.optimize_branch_lengths(tree, part, [0] * CATS,
                                             max_sweeps=2)
    assert logl2 >= logl - 1e-6


def test_blopt_matches_oracle_newton():
    """Drive the same per-edge Newton loop through the compiled reference
    and compare optimized branch lengths + final logL."""
    import oracle
    if not oracle.available():
        pytest.skip("no oracle")

    tree, part, seqs = _setup(seed=9, perturb=1.8)
    tree_ref = ut.parse_newick_string(ut.export_newick(tree.root))

    logl, _ = blopt.optimize_branch_lengths(tree, part, [0] * CATS,
                                            max_sweeps=3, tol=0.0)

    # oracle-driven loop, same visit order / same acceptance rule
    from libpll_tpu.models.gamma import compute_gamma_cats
    from test_spr_search import FREQS, PARAMS, ALPHA, SITES

    ref = oracle.RefPartition(TIPS, TIPS - 2, 4, SITES, 1, 2 * TIPS - 3,
                              CATS, TIPS - 2)
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree_ref)}
    for lab, s in seqs.items():
        ref.set_tip_states(order[lab], oracle.map_table("pll_map_nt"), s)
    ref.set_frequencies(0, FREQS)
    ref.set_subst_params(0, PARAMS)
    ref.set_category_rates(compute_gamma_cats(ALPHA, CATS))
    pidx = [0] * CATS

    def full_eval(root):
        trav = ut.traverse(root)
        ops, blens, midx = ut.create_operations(trav)
        ref.update_prob_matrices(pidx, midx, blens)
        ref.update_partials([o.as_tuple() for o in ops])
        return ref.edge_loglikelihood(root.clv_index, root.scaler_index,
                                      root.back.clv_index,
                                      root.back.scaler_index,
                                      root.pmatrix_index, pidx)

    root = tree_ref.root
    logl_ref = full_eval(root)
    for _ in range(3):
        seen = set()
        for node in ut.traverse(root, ut.TRAVERSE_PREORDER):
            if node.pmatrix_index in seen:
                continue
            seen.add(node.pmatrix_index)
            u = node if not node.is_tip else node.back
            # oracle loop: recompute everything for the new orientation
            trav = ut.traverse(u)
            ops, blens, midx = ut.create_operations(trav)
            ref.update_prob_matrices(pidx, midx, blens)
            ref.update_partials([o.as_tuple() for o in ops])
            st = ref.sumtable(u.clv_index, u.back.clv_index, -1, -1, pidx)
            t = u.length
            for _ in range(32):
                d1, d2 = ref.likelihood_derivatives(-1, -1, t, pidx, st)
                if abs(d1) < 1e-9:
                    break
                step = d1 / d2 if d2 != 0 else d1
                t = min(max(t - step, blopt.MIN_BL), blopt.MAX_BL)
            if not np.isfinite(t):
                continue
            old = u.length
            u.length = u.back.length = t
            new_logl = full_eval(u)
            if new_logl + 1e-12 < logl_ref:
                u.length = u.back.length = old
                full_eval(u)
                continue
            logl_ref = new_logl

    np.testing.assert_allclose(logl, logl_ref, atol=5e-6)

    # optimized lengths agree edge by edge
    ours = {}
    for n in tree.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            ours[m.pmatrix_index] = m.length
    theirs = {}
    for n in tree_ref.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            theirs[m.pmatrix_index] = m.length
    for k in ours:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=5e-4,
                                   atol=1e-6, err_msg=f"edge {k}")


def test_blopt_scan_matches_loop():
    """The device-resident whole-sweep program (one compiled scan over all
    edges) must reproduce the per-edge host loop's optimization."""
    tree1, part1, seqs = _setup(seed=5, perturb=2.2)
    l_loop, _ = blopt.optimize_branch_lengths(tree1, part1, [0] * CATS,
                                              max_sweeps=4)
    tree2, part2, _ = _setup(seed=5, perturb=2.2)
    l_scan, _ = blopt.optimize_branch_lengths_scan(tree2, part2,
                                                   [0] * CATS,
                                                   max_sweeps=4)
    assert abs(l_loop - l_scan) < 0.5

    tree_chk = ut.parse_newick_string(ut.export_newick(tree2.root))
    part_chk = _partition_for(tree_chk, seqs)
    np.testing.assert_allclose(l_scan, _full_logl(tree_chk, part_chk),
                               atol=1e-6)


def test_blopt_local_subset_sweep():
    """Edge-subset sweeps (the local pass after a topology move): only the
    subset's lengths change, the logL never regresses, and the fixed
    edge_pad envelope (padding by repeating the last edge) gives the same
    result as the unpadded subset."""
    from libpll_tpu.errors import CapacityError

    tree, part, seqs = _setup(seed=7, perturb=2.0)
    before = {}
    for n in tree.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            before[m.pmatrix_index] = m.length
    subset = set(list(before)[:5])
    logl0 = _full_logl(tree, part)

    logl, _ = blopt.optimize_branch_lengths_scan(
        tree, part, [0] * CATS, max_sweeps=2, edges=subset, edge_pad=8)
    assert logl >= logl0 - 1e-9, (logl0, logl)
    changed = 0
    for n in tree.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            if m.pmatrix_index in subset:
                changed += m.length != before[m.pmatrix_index]
            else:
                assert m.length == before[m.pmatrix_index], m.pmatrix_index
    assert changed > 0

    # unpadded subset run from the same start state gives the same lengths
    tree2, part2, _ = _setup(seed=7, perturb=2.0)
    logl2, _ = blopt.optimize_branch_lengths_scan(
        tree2, part2, [0] * CATS, max_sweeps=2, edges=subset)
    np.testing.assert_allclose(logl2, logl, rtol=1e-9)
    lens2 = {}
    for n in tree2.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            lens2[m.pmatrix_index] = m.length
    for k in subset:
        np.testing.assert_allclose(lens2[k], _edge_len(tree, k), rtol=1e-9)

    # a subset larger than the envelope is a typed capacity error
    with pytest.raises(CapacityError):
        blopt.optimize_branch_lengths_scan(
            tree2, part2, [0] * CATS, max_sweeps=1,
            edges=set(list(before)[:9]), edge_pad=8)


def _edge_len(tree, pmatrix_index):
    for n in tree.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            if m.pmatrix_index == pmatrix_index:
                return m.length
    raise KeyError(pmatrix_index)
