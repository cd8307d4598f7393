"""Asc-bias and prop-invar on the in-kernel scoring fast paths.

The fused edge-score kernel (make_score), the data-driven unbounded scorer
(make_score_unbounded) and the sharded scorer must match make_forward — the
XLA reference path whose asc/+I semantics are oracle-verified — for all
three asc flavors and for +I, so tree search never has to leave the fast
path (reference `src/likelihood.c:321-414`, `src/core_likelihood.c:960-978`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libpll_tpu.engine import evaluate as ev
from libpll_tpu.ops.likelihood import (ASC_FELSENSTEIN, ASC_LEWIS,
                                       ASC_STAMATAKIS)
from libpll_tpu.utils.constants import SCALE_PER_RATE, SCALE_PER_SITE

from test_clv_pallas import _caterpillar_newick, _random_tree_newick
from test_clv_pallas_seg import _build

SITES = 128
CATS, STATES = 4, 4


def _asc_model(model, states, asc_weights):
    """Forward-path model with the S pseudo-columns appended to the site
    axis (weights = asc state weights); score-path model with asc_weights
    carried separately."""
    fwd = dict(model)
    pw = np.zeros(SITES + states, np.float32)
    pw[:SITES] = np.asarray(model["pattern_weights"])
    pw[SITES:] = asc_weights
    fwd["pattern_weights"] = jnp.asarray(pw)
    fwd["invariant"] = jnp.full((SITES + states,), -1, jnp.int32)

    sc = dict(model)
    sc["asc_weights"] = jnp.asarray(asc_weights, jnp.float32)
    return fwd, sc


def _asc_clv(clv, states):
    """Append the S all-one-state pseudo-columns to every tip CLV."""
    nodes, C, S, L = clv.shape
    eye = np.eye(states, dtype=np.float32)
    ext = np.zeros((nodes, C, S, L + states), np.float32)
    ext[..., :L] = np.asarray(clv)
    tips_mask = np.asarray(clv).sum(axis=(1, 2, 3)) > 0  # tips are set
    ext[tips_mask, :, :, L:] = eye[None, None]
    return jnp.asarray(ext)


@pytest.mark.parametrize("asc_mode", [ASC_LEWIS, ASC_FELSENSTEIN,
                                      ASC_STAMATAKIS])
@pytest.mark.parametrize("newick_fn,tips", [
    (_random_tree_newick, 12),
    (_caterpillar_newick, 24),   # deep chain: nonzero scalers in the tail
])
def test_score_asc_matches_forward(asc_mode, newick_fn, tips):
    rng = np.random.default_rng(tips + asc_mode)
    newick = (newick_fn(tips, rng) if newick_fn is _random_tree_newick
              else newick_fn(tips))
    topo, model, pmatrix, clv, scalers = _build(newick, sites=SITES)
    topo_asc = topo._replace(asc_mode=asc_mode)
    asc_w = rng.integers(1, 4, STATES).astype(np.float64)
    fwd_model, sc_model = _asc_model(model, STATES, asc_w)

    # forward reference: asc columns ride the site axis
    topo_fwd = topo_asc._replace(sites=SITES)
    fwd = ev.make_forward(topo_fwd)
    clv_fwd = _asc_clv(clv, STATES)
    scal_fwd = jnp.zeros((topo.schedule.n_inner + 1, SITES + STATES),
                         jnp.int32)
    want, _ = fwd(fwd_model, clv_fwd, scal_fwd)

    # fused score kernel + asc tail
    from libpll_tpu.ops import clv_pallas as cp
    score = ev.make_score(topo_asc, CATS, STATES, impl="vpu",
                          interpret=True)
    tips_packed = cp.pack_tips(clv[:topo.schedule.tips], "vpu")
    got = score(sc_model, tips_packed)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    # data-driven unbounded scorer (pattern-tip) + asc tail
    clv_np = np.asarray(clv[:topo.schedule.tips])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(STATES, dtype=np.uint32)[None, :, None]).sum(1)
    score_u = ev.make_score_unbounded(topo_asc, CATS, STATES, masks,
                                      interpret=True)
    got_u = score_u(sc_model)
    np.testing.assert_allclose(float(got_u), float(want), rtol=2e-6)


@pytest.mark.parametrize("scale_mode", [SCALE_PER_SITE, SCALE_PER_RATE])
def test_score_pinv_matches_forward(scale_mode):
    """+I on the fast paths: linear in-kernel fold vs the XLA mix."""
    rng = np.random.default_rng(7)
    newick = _random_tree_newick(12, rng)
    topo, model, pmatrix, clv, scalers = _build(newick, sites=SITES,
                                                scale_mode=scale_mode)
    tips = topo.schedule.tips

    # plant invariant columns: make the first 16 sites constant state 0
    clv_np = np.array(clv)
    const = np.zeros((STATES, 16), np.float32)
    const[0] = 1.0
    clv_np[:tips, :, :, :16] = const[None, None]
    clv = jnp.asarray(clv_np)

    pinv = 0.25
    invariant = np.full(SITES, -1, np.int32)
    invariant[:16] = 0
    model = dict(model)
    model["prop_invar"] = jnp.asarray([pinv], jnp.float32)
    model["prop_invar_pc"] = jnp.full((CATS,), pinv, jnp.float32)
    model["invariant"] = jnp.asarray(invariant)

    fwd = ev.make_forward(topo)
    want, _ = fwd(model, clv, scalers)

    if scale_mode == SCALE_PER_SITE:
        from libpll_tpu.ops import clv_pallas as cp
        score = ev.make_score(topo, CATS, STATES, impl="vpu",
                              use_pinv=True, interpret=True)
        got = score(model, cp.pack_tips(clv[:tips], "vpu"))
        np.testing.assert_allclose(float(got), float(want), rtol=2e-6)

    clv_t = np.asarray(clv[:tips])
    masks = ((clv_t[:, 0] > 0).astype(np.uint32)
             << np.arange(STATES, dtype=np.uint32)[None, :, None]).sum(1)
    score_u = ev.make_score_unbounded(topo, CATS, STATES, masks,
                                      use_pinv=True, interpret=True)
    got_u = score_u(model)
    np.testing.assert_allclose(float(got_u), float(want), rtol=2e-6)


def test_score_sharded_asc_pinv():
    """Sharded fused scorer with +I, and with asc (replicated tail), on the
    virtual CPU mesh (interpret-mode kernel)."""
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4])
    if devs.size < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(devs, ("sites",))

    rng = np.random.default_rng(3)
    newick = _random_tree_newick(10, rng)
    topo, model, pmatrix, clv, scalers = _build(newick, sites=4 * SITES)
    tips = topo.schedule.tips

    # +I config
    clv_np = np.array(clv)
    const = np.zeros((STATES, 32), np.float32)
    const[1] = 1.0
    clv_np[:tips, :, :, :32] = const[None, None]
    clv = jnp.asarray(clv_np)
    invariant = np.full(4 * SITES, -1, np.int32)
    invariant[:32] = 1
    model = dict(model)
    model["prop_invar"] = jnp.asarray([0.3], jnp.float32)
    model["prop_invar_pc"] = jnp.full((CATS,), 0.3, jnp.float32)
    model["invariant"] = jnp.asarray(invariant)

    fwd = ev.make_forward(topo)
    want, _ = fwd(model, clv, scalers)

    from libpll_tpu.ops import clv_pallas as cp
    score = ev.make_score_sharded(topo, CATS, STATES, mesh, impl="vpu",
                                  use_pinv=True, interpret=True)
    got = score(model, cp.pack_tips(clv[:tips], "vpu"))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-6)
