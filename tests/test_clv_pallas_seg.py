"""Parity tests for the segmented fused sweep (ops/clv_pallas_seg.py) —
large-tree path — against the XLA level sweep, in interpreter mode with a
tiny row budget to force multi-segment cuts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libpll_tpu.engine.evaluate import (_pmatrices, make_forward,
                                        topology_from_tree)
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.models.gtr import eigen_decompose
from libpll_tpu.ops import clv_pallas as cp
from libpll_tpu.ops import clv_pallas_seg as cps
from libpll_tpu.ops.sweep import make_level_sweep
from libpll_tpu.tree import utree as ut
from libpll_tpu.utils.constants import SCALE_PER_RATE, SCALE_PER_SITE

from test_clv_pallas import _caterpillar_newick, _random_tree_newick


def _build(newick, sites=256, rate_cats=4, states=4, seed=0,
           scale_mode=SCALE_PER_SITE):
    rng = np.random.default_rng(seed)
    tree = ut.parse_newick_string(newick)
    tips = tree.tip_count
    topo, branches = topology_from_tree(tree, sites, scale_mode=scale_mode)
    n_params = states * (states - 1) // 2
    params = rng.uniform(0.5, 2.0, n_params)
    freqs = rng.uniform(0.1, 1.0, states)
    freqs /= freqs.sum()
    w, left, right = eigen_decompose(params, freqs)
    dtype = jnp.float32
    model = {
        "branch_lengths": jnp.asarray(branches, dtype),
        "rates": jnp.asarray(compute_gamma_cats(1.0, rate_cats), dtype),
        "prop_invar": jnp.zeros((1,), dtype),
        "params_indices": jnp.zeros(rate_cats, np.int32),
        "eigenvals": jnp.asarray(w[None], dtype),
        "left": jnp.asarray(left[None], dtype),
        "right": jnp.asarray(right[None], dtype),
        "freqs_pc": jnp.asarray(np.broadcast_to(freqs, (rate_cats, states)),
                                dtype),
        "prop_invar_pc": jnp.zeros((rate_cats,), dtype),
        "rate_weights": jnp.full((rate_cats,), 1.0 / rate_cats, dtype),
        "pattern_weights": jnp.ones((sites,), dtype),
        "invariant": jnp.full((sites,), -1, jnp.int32),
    }
    nodes = 2 * tips - 2
    clv = np.zeros((nodes, rate_cats, states, sites), np.float32)
    st = rng.integers(0, states, (tips, sites))
    clv[:tips] = np.eye(states, dtype=np.float32)[st].transpose(
        0, 2, 1)[:, None]
    clv = jnp.asarray(clv)
    sshape = ((topo.schedule.n_inner + 1, rate_cats, sites)
              if scale_mode == SCALE_PER_RATE
              else (topo.schedule.n_inner + 1, sites))
    scalers = jnp.zeros(sshape, jnp.int32)
    pmatrix = _pmatrices(model, topo, dtype)
    return topo, model, pmatrix, clv, scalers


@pytest.mark.parametrize("newick_fn,tips,max_rows", [
    (_random_tree_newick, 32, 16),
    (_caterpillar_newick, 48, 20),   # deep chain: nested cuts + scaling
])
def test_segmented_sweep_matches_xla(newick_fn, tips, max_rows):
    rng = np.random.default_rng(tips)
    newick = (newick_fn(tips, rng) if newick_fn is _random_tree_newick
              else newick_fn(tips))
    topo, model, pmatrix, clv, scalers = _build(newick, sites=128)
    t = topo.schedule.tips

    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_SITE)(
        clv, scalers, pmatrix)

    seg = cps.build_segmented_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=max_rows,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    assert len(seg.segments) > 2  # the budget actually forced cuts

    slabs = cps.pack_tips_segmented(clv[:t], seg, "mxu")
    sweep = cps.make_segmented_sweep(seg, SCALE_PER_SITE, impl="mxu",
                                     rate_cats=4, states=4, block_sites=128,
                                     interpret=True)
    inner, scal = sweep(slabs, pmatrix)
    got = np.asarray(cp.unpack_clv(inner, 4, 4, "mxu"))
    ref = np.asarray(clv_ref)
    sref, sgot = np.asarray(scal_ref), np.asarray(scal)
    for r in range(topo.schedule.n_inner):
        assert np.array_equal(ref[t + r], got[seg.inner_row(r)]), r
        assert np.array_equal(sref[r], sgot[seg.scaler_row(r)]), r


@pytest.mark.parametrize("impl", ["mxu", "vpu"])
def test_segmented_score_matches_forward(impl):
    rng = np.random.default_rng(9)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(24, rng), sites=128, seed=9)
    t = topo.schedule.tips
    logl_ref, _ = make_forward(topo)(model, clv, scalers)

    seg = cps.build_segmented_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=14,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    slabs = cps.pack_tips_segmented(clv[:t], seg, impl)
    score = cps.make_segmented_score(
        seg, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_SITE, impl=impl, rate_cats=4, states=4, block_sites=128,
        interpret=True)
    wvec = cp.pack_weight_vec(model["freqs_pc"], model["rate_weights"], impl)
    pw = model["pattern_weights"][None, :].astype(jnp.float32)
    logl = score(slabs, pmatrix, wvec, pw)
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-6)


def test_segmented_sweep_per_rate_matches_xla():
    """PLL_ATTRIB_RATE_SCALERS on the segmented kernels: per (site, rate)
    counters, bit-exact vs the XLA level sweep (mxu accumulation order)."""
    topo, model, pmatrix, clv, scalers = _build(
        _caterpillar_newick(48), sites=128, scale_mode=SCALE_PER_RATE)
    t = topo.schedule.tips

    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_RATE)(
        clv, scalers, pmatrix)
    assert int(jnp.max(scal_ref)) > 0  # the deep chain actually scales

    seg = cps.build_segmented_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    assert len(seg.segments) > 2
    slabs = cps.pack_tips_segmented(clv[:t], seg, "mxu")
    sweep = cps.make_segmented_sweep(seg, SCALE_PER_RATE, impl="mxu",
                                     rate_cats=4, states=4, block_sites=128,
                                     interpret=True)
    inner, scal = sweep(slabs, pmatrix)
    assert scal.shape == (topo.schedule.n_inner + 1, 4, 128)
    got = np.asarray(cp.unpack_clv(inner, 4, 4, "mxu"))
    ref = np.asarray(clv_ref)
    sref, sgot = np.asarray(scal_ref), np.asarray(scal)
    for r in range(topo.schedule.n_inner):
        assert np.array_equal(ref[t + r], got[seg.inner_row(r)]), r
        assert np.array_equal(sref[r], sgot[seg.scaler_row(r)]), r


@pytest.mark.parametrize("impl", ["mxu", "vpu"])
def test_segmented_score_per_rate_matches_forward(impl):
    """In-kernel min/cap per-rate scaler fold (core_likelihood.c:916-941)
    in the segmented score matches the XLA forward."""
    topo, model, pmatrix, clv, scalers = _build(
        _caterpillar_newick(48), sites=128, scale_mode=SCALE_PER_RATE)
    t = topo.schedule.tips
    logl_ref, _ = make_forward(topo)(model, clv, scalers)

    seg = cps.build_segmented_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    slabs = cps.pack_tips_segmented(clv[:t], seg, impl)
    score = cps.make_segmented_score(
        seg, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_RATE, impl=impl, rate_cats=4, states=4, block_sites=128,
        interpret=True)
    wvec = cp.pack_weight_vec(model["freqs_pc"], model["rate_weights"], impl)
    pw = model["pattern_weights"][None, :].astype(jnp.float32)
    logl = score(slabs, pmatrix, wvec, pw)
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-6)
