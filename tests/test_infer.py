"""End-to-end ML tree inference (search/infer.py): stepwise parsimony
start, alternating device-resident branch-length sweeps and batched
incremental SPR rounds.  On simulated data the pipeline must reach (at
least) the likelihood of the true topology with optimized branch
lengths."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from libpll_tpu.engine import blopt
from libpll_tpu.errors import CapacityError, ParamError
from libpll_tpu.search import infer as infer_mod
from libpll_tpu.search import spr as spr_mod
from libpll_tpu.search.infer import infer_tree
from libpll_tpu.tree import utree as ut

from test_spr_search import (_partition_for, _random_tree, _simulate,
                             _full_logl, TIPS, CATS, FREQS, PARAMS, ALPHA)


def test_infer_reaches_true_tree_likelihood():
    rng = np.random.default_rng(41)
    true_newick = _random_tree(TIPS, rng)
    seqs = _simulate(true_newick, rng)

    res = infer_tree(seqs, rate_cats=CATS, alpha=ALPHA,
                     frequencies=FREQS, subst_params=PARAMS,
                     seed=42, radius=8, max_rounds=8)
    assert res.rounds >= 1
    assert res.trajectory == sorted(res.trajectory)  # monotone

    # consistency: from-scratch evaluation of the inferred tree
    tree_chk = ut.parse_newick_string(ut.export_newick(res.tree.root))
    part_chk = _partition_for(tree_chk, seqs)
    want = _full_logl(tree_chk, part_chk)
    np.testing.assert_allclose(res.logl, want, atol=1e-5)

    # benchmark: the true topology with optimized branch lengths
    tree_true = ut.parse_newick_string(true_newick)
    part_true = _partition_for(tree_true, seqs)
    logl_true, _ = blopt.optimize_branch_lengths_scan(
        tree_true, part_true, [0] * CATS, max_sweeps=6)
    assert res.logl >= logl_true - 1.0, (res.logl, logl_true)


def test_infer_compression_invariant():
    """Pattern compression must not change the inferred likelihood (same
    seed, same model; `pll_compress_site_patterns` semantics)."""
    rng = np.random.default_rng(8)
    true_newick = _random_tree(TIPS, rng)
    seqs = _simulate(true_newick, rng)
    kw = dict(rate_cats=CATS, alpha=ALPHA, frequencies=FREQS,
              subst_params=PARAMS, seed=7, radius=5, max_rounds=3)
    res_c = infer_tree(seqs, compress=True, **kw)
    res_u = infer_tree(seqs, compress=False, **kw)
    np.testing.assert_allclose(res_c.logl, res_u.logl, atol=1e-6)
    assert (ut.export_newick(res_c.tree.root)
            == ut.export_newick(res_u.tree.root))


def test_spr_round_capacity_overflow_is_typed():
    """A too-small envelope raises CapacityError (the one retryable
    condition), not a generic failure."""
    rng = np.random.default_rng(11)
    tree = ut.parse_newick_string(_random_tree(TIPS, rng))
    seqs = _simulate(ut.export_newick(tree.root), rng)
    part = _partition_for(tree, seqs)
    with pytest.raises(CapacityError):
        spr_mod.spr_round(tree, part, [0] * CATS, radius=6, capacity=2)


def test_infer_does_not_mask_unrelated_errors(monkeypatch):
    """An injected non-capacity failure inside the SPR round must
    propagate immediately — not be retried as a capacity overflow."""
    rng = np.random.default_rng(12)
    seqs = _simulate(_random_tree(TIPS, rng), rng)

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected unrelated failure")

    monkeypatch.setattr(infer_mod, "spr_round", boom)
    with pytest.raises(RuntimeError, match="injected"):
        infer_tree(seqs, rate_cats=CATS, alpha=ALPHA, frequencies=FREQS,
                   subst_params=PARAMS, seed=5, radius=3, max_rounds=2)
    assert calls["n"] == 1  # no capacity-style retry happened


def test_infer_single_scorer_compile_at_default_radius(monkeypatch):
    """The radius-derived envelope must be big enough that infer_tree
    builds exactly ONE SPR scorer (no resize recompile) by default."""
    rng = np.random.default_rng(13)
    seqs = _simulate(_random_tree(TIPS, rng), rng)

    builds = {"n": 0}
    real = infer_mod.make_round_scorer

    def counting(part, cap):
        builds["n"] += 1
        return real(part, cap)

    monkeypatch.setattr(infer_mod, "make_round_scorer", counting)
    res = infer_tree(seqs, rate_cats=CATS, alpha=ALPHA, frequencies=FREQS,
                     subst_params=PARAMS, seed=5, radius=5, max_rounds=4)
    assert np.isfinite(res.logl)
    assert builds["n"] == 1, f"scorer compiled {builds['n']} times"


def test_blopt_rejects_zero_sweeps():
    rng = np.random.default_rng(14)
    tree = ut.parse_newick_string(_random_tree(TIPS, rng))
    seqs = _simulate(ut.export_newick(tree.root), rng)
    part = _partition_for(tree, seqs)
    with pytest.raises(ParamError):
        blopt.optimize_branch_lengths(tree, part, [0] * CATS, max_sweeps=0)
    with pytest.raises(ParamError):
        blopt.optimize_branch_lengths_scan(tree, part, [0] * CATS,
                                           max_sweeps=0)


def test_spr_round_rejects_contained_regraft():
    """A caller-supplied candidate whose regraft edge lies inside the
    pruned subtree must be skipped (spr_safe containment), leaving the
    tree intact, instead of silently corrupting it."""
    rng = np.random.default_rng(15)
    tree = ut.parse_newick_string(_random_tree(TIPS, rng))
    seqs = _simulate(ut.export_newick(tree.root), rng)
    part = _partition_for(tree, seqs)
    # find an inner node p and an edge INSIDE its pruned subtree (behind
    # p.back)
    p = next(n for n in ut.query_innernodes(tree)
             if n.back.next is not None)
    inside = p.back.next.back
    before = ut.export_newick(tree.root)
    res = spr_mod.spr_round(tree, part, [0] * CATS,
                            candidates=[(p, inside)])
    assert not res.improved and res.n_candidates == 0
    assert ut.export_newick(tree.root) == before
    assert ut.check_integrity(tree)


def test_infer_protein():
    """Inference end-to-end on a 20-state alphabet (WAG-ish params via
    uniform defaults): exercises protein Fitch packing, the generic
    incremental scorer and the blopt program at S=20."""
    rng = np.random.default_rng(2)
    aas = "ARNDCQEGHILKMFPSTWYV"
    labels = [f"p{i}" for i in range(6)]
    seqs = {lab: "".join(rng.choice(list(aas), 40)) for lab in labels}
    res = infer_tree(seqs, states=20, rate_cats=2, alpha=1.0, seed=3,
                     radius=4, max_rounds=2)
    assert np.isfinite(res.logl)
    tree_chk = ut.parse_newick_string(ut.export_newick(res.tree.root))
    assert tree_chk.tip_count == 6


def test_infer_tree_nni_moves():
    """moves="nni" drives the search with nearest-neighbor interchanges:
    valid tree, monotone trajectory, and an unknown move set raises."""
    rng = np.random.default_rng(9)
    seqs = _simulate(_random_tree(TIPS, rng), rng)
    res = infer_tree(seqs, rate_cats=CATS, alpha=ALPHA,
                     frequencies=FREQS, subst_params=PARAMS,
                     seed=7, moves="nni", max_rounds=6)
    assert ut.check_integrity(res.tree)
    assert res.trajectory == sorted(res.trajectory)  # monotone
    assert res.logl >= res.trajectory[0] - 1e-9
    with pytest.raises(ValueError):
        infer_tree(seqs, moves="tbr")


def test_infer_tree_sharded_matches_single_device():
    """infer_tree(mesh=...) runs the complete pipeline sites-sharded
    (sharded stepwise build + sharded partition through every SPR/Newton
    round) and must reproduce the single-device inference exactly."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device (virtual) mesh")
    rng = np.random.default_rng(17)
    seqs = _simulate(_random_tree(TIPS, rng), rng)

    r1 = infer_tree(seqs, rate_cats=CATS, alpha=ALPHA, frequencies=FREQS,
                    subst_params=PARAMS, seed=3, max_rounds=4)
    mesh = Mesh(np.asarray(jax.devices()), ("sites",))
    r2 = infer_tree(seqs, rate_cats=CATS, alpha=ALPHA, frequencies=FREQS,
                    subst_params=PARAMS, seed=3, max_rounds=4, mesh=mesh)
    assert r1.start_parsimony_score == r2.start_parsimony_score
    assert ut.export_newick(r1.tree.root) == ut.export_newick(r2.tree.root)
    np.testing.assert_allclose(r2.logl, r1.logl, rtol=1e-9)
    assert "sites" in str(r2.partition.clv.sharding.spec)


def test_infer_local_blopt_matches_full():
    """The local changed-neighborhood Newton pass (local_blopt, default)
    must reach the same optimum as full 2n-3-edge sweeps every round —
    the full sweep still runs as the convergence check, so the final
    tree is fully optimized either way."""
    rng = np.random.default_rng(12)
    true_newick = _random_tree(TIPS, rng)
    seqs = _simulate(true_newick, rng)
    kw = dict(rate_cats=CATS, alpha=ALPHA, frequencies=FREQS,
              subst_params=PARAMS, seed=5, radius=6, max_rounds=8)
    res_local = infer_tree(seqs, local_blopt=3, **kw)
    res_full = infer_tree(seqs, local_blopt=0, **kw)
    assert res_local.trajectory == sorted(res_local.trajectory)
    assert res_local.logl >= res_full.logl - 0.5, (
        res_local.logl, res_full.logl)

    # consistency of the local-path result
    tree_chk = ut.parse_newick_string(ut.export_newick(res_local.tree.root))
    part_chk = _partition_for(tree_chk, seqs)
    np.testing.assert_allclose(res_local.logl, _full_logl(tree_chk, part_chk),
                               atol=1e-5)
