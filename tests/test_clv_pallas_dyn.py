"""Parity of the data-driven (scalar-prefetch) fused sweep against the XLA
level sweep — schedule-as-data kernels share one compiled binary across all
segments (ops/clv_pallas_dyn.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libpll_tpu.ops import clv_pallas as cp
from libpll_tpu.ops import clv_pallas_dyn as cpd
from libpll_tpu.ops.sweep import make_level_sweep
from libpll_tpu.utils.constants import SCALE_PER_SITE

from test_clv_pallas import _caterpillar_newick
from test_clv_pallas_seg import _build, _random_tree_newick


@pytest.mark.parametrize("newick_fn,tips,max_rows", [
    (_random_tree_newick, 24, 24),
    (_caterpillar_newick, 16, 12),  # deep chain: nested cuts
])
def test_dyn_sweep_matches_xla(newick_fn, tips, max_rows):
    rng = np.random.default_rng(tips)
    newick = (newick_fn(tips, rng) if newick_fn is _random_tree_newick
              else newick_fn(tips))
    topo, model, pmatrix, clv, scalers = _build(newick, sites=128)
    # interpreter mode is slow: keep cases tiny
    t = topo.schedule.tips
    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_SITE)(
        clv, scalers, pmatrix)

    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=max_rows, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    slabs = cpd.pack_tips_dyn(clv[:t], dyn, "vpu")
    tables, m_g = cpd.dyn_runtime_args(dyn)
    sweep = cpd.make_dyn_sweep(dyn, SCALE_PER_SITE, rate_cats=4, states=4,
                               interpret=True)
    inner, scal = sweep(slabs, tables, m_g, pmatrix)

    # bit-exact vs the unrolled vpu kernel (same contraction order); the XLA
    # einsum is compared site-normalized (tiny decayed entries accumulate
    # order-dependent rounding)
    usweep = cp.make_fused_sweep(topo.schedule, SCALE_PER_SITE, impl="vpu",
                                 rate_cats=4, states=4, block_sites=128,
                                 interpret=True)
    inner_u, scal_u = usweep(cp.pack_tips(clv[:t], "vpu"), pmatrix)
    gu, gd = np.asarray(inner_u), np.asarray(inner)
    su, sd = np.asarray(scal_u), np.asarray(scal)
    ref = np.asarray(clv_ref)
    got = np.asarray(cp.unpack_clv(inner, 4, 4, "vpu"))
    sref, sgot = np.asarray(scal_ref), np.asarray(scal)
    for r in range(topo.schedule.n_inner):
        assert np.array_equal(gu[r], gd[dyn.inner_row(r)]), r
        assert np.array_equal(su[r], sd[dyn.scaler_row(r)]), r
        a, b = ref[t + r], got[dyn.inner_row(r)]
        sm = np.abs(a).max(axis=(0, 1), keepdims=True)
        assert (np.abs(a - b) / np.maximum(sm, 1e-300)).max() < 1e-5, r
        assert np.array_equal(sref[r], sgot[dyn.scaler_row(r)]), r


def test_dyn_tipchars_matches_clv_encoding():
    """Pattern-tip mode (int8 ambiguity bitmasks decoded in VMEM) is
    bit-identical to explicit tip CLVs."""
    rng = np.random.default_rng(5)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(20, rng), sites=128, seed=5)
    t = topo.schedule.tips
    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    tables, m_g = cpd.dyn_runtime_args(dyn)
    slabs = cpd.pack_tips_dyn(clv[:t], dyn, "vpu")
    sweep = cpd.make_dyn_sweep(dyn, SCALE_PER_SITE, rate_cats=4, states=4,
                               interpret=True)
    inner_a, scal_a = sweep(slabs, tables, m_g, pmatrix)

    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.int32)
             * (1 << np.arange(4))[:, None][None]).sum(axis=1)
    slabs_c = cpd.pack_tipchars_dyn(masks, dyn)
    sweep_c = cpd.make_dyn_sweep(dyn, SCALE_PER_SITE, rate_cats=4,
                                 states=4, tip_encoding="chars",
                                 interpret=True)
    inner_b, scal_b = sweep_c(slabs_c, tables, m_g, pmatrix)
    assert jnp.array_equal(inner_a, inner_b)
    assert jnp.array_equal(scal_a, scal_b)


def test_dyn_score_matches_forward():
    """Exports-only leaf segments + in-kernel root logL (the unbounded-size
    scoring path) matches the XLA forward."""
    from libpll_tpu.engine.evaluate import make_forward

    rng = np.random.default_rng(5)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(20, rng), sites=128, seed=5)
    t = topo.schedule.tips
    logl_ref, _ = make_forward(topo)(model, clv, scalers)
    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    tables, m_g, exp_t = cpd.dyn_score_args(dyn)
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.int32)
             * (1 << np.arange(4))[:, None][None]).sum(axis=1)
    slabs_c = cpd.pack_tipchars_dyn(masks, dyn)
    score = cpd.make_dyn_score(
        topo_dyn := dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_SITE, rate_cats=4, states=4, interpret=True)
    wvec = cp.pack_weight_vec(model["freqs_pc"], model["rate_weights"],
                              "vpu")
    pw = model["pattern_weights"][None, :].astype(jnp.float32)
    logl = score(slabs_c, tables, m_g, exp_t, pmatrix, wvec, pw)
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-6)


def test_engine_unbounded_score():
    """make_score_unbounded: pattern-tip scoring behind one engine call."""
    from libpll_tpu.engine.evaluate import make_forward, make_score_unbounded

    rng = np.random.default_rng(5)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(20, rng), sites=128, seed=5)
    t = topo.schedule.tips
    logl_ref, _ = make_forward(topo)(model, clv, scalers)
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.int32)
             * (1 << np.arange(4))[:, None][None]).sum(axis=1)
    score = make_score_unbounded(topo, 4, 4, masks, interpret=True)
    np.testing.assert_allclose(float(score(model)), float(logl_ref),
                               rtol=2e-6)


def test_dyn_sweep_per_rate_matches_xla():
    """PLL_ATTRIB_RATE_SCALERS on the data-driven kernels: per (site, rate)
    counters, cross-checked bit-exact vs the unrolled vpu kernel and
    counter-exact vs the XLA level sweep."""
    from libpll_tpu.utils.constants import SCALE_PER_RATE

    topo, model, pmatrix, clv, scalers = _build(
        _caterpillar_newick(48), sites=128, scale_mode=SCALE_PER_RATE)
    t = topo.schedule.tips
    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_RATE)(
        clv, scalers, pmatrix)
    assert int(np.max(np.asarray(scal_ref))) > 0  # scaling actually fires

    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    slabs = cpd.pack_tips_dyn(clv[:t], dyn, "vpu")
    tables, m_g = cpd.dyn_runtime_args(dyn)
    sweep = cpd.make_dyn_sweep(dyn, SCALE_PER_RATE, rate_cats=4, states=4,
                               interpret=True)
    inner, scal = sweep(slabs, tables, m_g, pmatrix)
    assert scal.shape == (topo.schedule.n_inner + 1, 4, 128)

    usweep = cp.make_fused_sweep(topo.schedule, SCALE_PER_RATE, impl="vpu",
                                 rate_cats=4, states=4, block_sites=128,
                                 interpret=True)
    inner_u, scal_u = usweep(cp.pack_tips(clv[:t], "vpu"), pmatrix)
    gu, gd = np.asarray(inner_u), np.asarray(inner)
    su, sd = np.asarray(scal_u), np.asarray(scal)
    sref = np.asarray(scal_ref)
    for r in range(topo.schedule.n_inner):
        assert np.array_equal(gu[r], gd[dyn.inner_row(r)]), r
        assert np.array_equal(su[r], sd[dyn.scaler_row(r)]), r
        assert np.array_equal(sref[r], sd[dyn.scaler_row(r)]), r


def test_dyn_score_per_rate_matches_forward():
    """In-kernel per-rate min/cap fold on the unbounded scoring path."""
    from libpll_tpu.engine.evaluate import make_forward
    from libpll_tpu.utils.constants import SCALE_PER_RATE

    topo, model, pmatrix, clv, scalers = _build(
        _caterpillar_newick(48), sites=128, scale_mode=SCALE_PER_RATE)
    t = topo.schedule.tips
    logl_ref, _ = make_forward(topo)(model, clv, scalers)
    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    tables, m_g, exp_t = cpd.dyn_score_args(dyn)
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.int32)
             * (1 << np.arange(4))[:, None][None]).sum(axis=1)
    slabs_c = cpd.pack_tipchars_dyn(masks, dyn)
    score = cpd.make_dyn_score(
        dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_RATE, rate_cats=4, states=4, interpret=True)
    wvec = cp.pack_weight_vec(model["freqs_pc"], model["rate_weights"],
                              "vpu")
    pw = model["pattern_weights"][None, :].astype(jnp.float32)
    logl = score(slabs_c, tables, m_g, exp_t, pmatrix, wvec, pw)
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-6)


@pytest.mark.parametrize("impl", ["vpu", "mxu"])
def test_dyn_score_protein_masks(impl):
    """Wide-alphabet pattern-tip mode: protein tips as 20-bit ambiguity
    masks (one int32 word per tip/site) decoded in VMEM, scored with the
    data-driven kernels (both contraction impls), vs the XLA forward."""
    from libpll_tpu.engine.evaluate import (_pmatrices, make_forward,
                                            topology_from_tree)
    from libpll_tpu.models.gamma import compute_gamma_cats
    from libpll_tpu.models.gtr import eigen_decompose
    from libpll_tpu.tree import utree as ut

    rng = np.random.default_rng(2)
    states, rate_cats, sites = 20, 2, 128
    newick = _random_tree_newick(12, rng)
    tree = ut.parse_newick_string(newick)
    tips = tree.tip_count
    topo, branches = topology_from_tree(tree, sites)
    params = rng.uniform(0.5, 2.0, states * (states - 1) // 2)
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
        "freqs_pc": jnp.asarray(
            np.broadcast_to(freqs, (rate_cats, states)), dtype),
        "prop_invar_pc": jnp.zeros((rate_cats,), dtype),
        "rate_weights": jnp.full((rate_cats,), 1.0 / rate_cats, dtype),
        "pattern_weights": jnp.ones((sites,), dtype),
        "invariant": jnp.full((sites,), -1, jnp.int32),
    }
    # masks: mostly unambiguous, a few gaps (all-ones) and 2-state ambigs
    st = rng.integers(0, states, (tips, sites))
    masks = (1 << st.astype(np.uint32))
    gap = rng.random((tips, sites)) < 0.03
    masks[gap] = (1 << states) - 1
    amb = rng.random((tips, sites)) < 0.03
    masks[amb] |= (1 << rng.integers(0, states, (tips, sites))
                   ).astype(np.uint32)[amb]

    clv = np.zeros((2 * tips - 2, rate_cats, states, sites), np.float32)
    for s in range(states):
        clv[:tips, :, s, :] = ((masks >> s) & 1)[:, None, :]
    clv = jnp.asarray(clv)
    scalers = jnp.zeros((topo.schedule.n_inner + 1, sites), jnp.int32)
    pmatrix = _pmatrices(model, topo, dtype)
    logl_ref, _ = make_forward(topo)(model, clv, scalers)

    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=rate_cats, states=states, max_rows=12,
        chunk=4, ensure_rows=[topo.parent_clv, topo.child_clv])
    tables, m_g, exp_t = cpd.dyn_score_args(dyn)
    slabs = cpd.pack_tipmasks_dyn(masks, dyn)
    score = cpd.make_dyn_score(
        dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_SITE, rate_cats=rate_cats, states=states,
        tip_encoding="masks", impl=impl, interpret=True)
    wvec = cp.pack_weight_vec(model["freqs_pc"], model["rate_weights"],
                              impl)
    pw = model["pattern_weights"][None, :].astype(jnp.float32)
    logl = score(slabs, tables, m_g, exp_t, pmatrix, wvec, pw)
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-5)


def test_dyn_sweep_masks_matches_chars():
    """For a 4-state alphabet the masks and chars encodings must produce
    bit-identical sweeps."""
    rng = np.random.default_rng(5)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(20, rng), sites=128, seed=5)
    t = topo.schedule.tips
    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=4, states=4, max_rows=20, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    tables, m_g = cpd.dyn_runtime_args(dyn)
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.int32)
             * (1 << np.arange(4))[:, None][None]).sum(axis=1)
    out = {}
    for enc, pack in (("chars", cpd.pack_tipchars_dyn),
                      ("masks", cpd.pack_tipmasks_dyn)):
        sweep = cpd.make_dyn_sweep(dyn, SCALE_PER_SITE, rate_cats=4,
                                   states=4, tip_encoding=enc,
                                   interpret=True)
        out[enc] = sweep(pack(masks, dyn), tables, m_g, pmatrix)
    assert jnp.array_equal(out["chars"][0], out["masks"][0])
    assert jnp.array_equal(out["chars"][1], out["masks"][1])


def test_dyn_score_branchy_multisegment_scaling():
    """Regression: on branchy (non-chain) multi-segment trees the root
    segment's import positions differ from the exporters' export-table
    positions; locate() must use the IMPORT order.  A 160-taxon random
    tree with 11 segments and active f32 scaling catches it (the bug made
    the evaluation edge read the wrong import row: logL off by ~3.5k)."""
    from libpll_tpu.engine.evaluate import make_forward

    rng = np.random.default_rng(1024)
    from test_clv_pallas_seg import _random_tree_newick as rtn
    topo, model, pmatrix, clv, scalers = _build(rtn(160, rng), sites=128)
    t = topo.schedule.tips
    want, _ = make_forward(topo)(model, clv, scalers)
    dyn = cpd.build_dyn_schedule(topo.schedule, rate_cats=4, states=4,
                                 max_rows=40, chunk=16,
                                 ensure_rows=[topo.parent_clv,
                                              topo.child_clv])
    assert len(dyn.segments) >= 8 and dyn.r_imp >= 2
    tables, m_g, exp_t = cpd.dyn_score_args(dyn)
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(4, dtype=np.uint32)[None, :, None]).sum(1)
    slabs = cpd.pack_tipchars_dyn(masks, dyn)
    score = cpd.make_dyn_score(dyn, topo.parent_clv, topo.child_clv,
                               topo.edge_matrix, SCALE_PER_SITE,
                               rate_cats=4, states=4, interpret=True)
    wvec = cp.pack_weight_vec(model["freqs_pc"], model["rate_weights"],
                              "vpu")
    pw = model["pattern_weights"][None, :].astype(jnp.float32)
    got = float(score(slabs, tables, m_g, exp_t, pmatrix, wvec, pw))
    np.testing.assert_allclose(got, float(want), rtol=2e-6)


@pytest.mark.parametrize("states", [4, 20])
def test_engine_unbounded_score_ambiguity_codes(states):
    """Multi-bit ambiguity/gap codes through the dyn pattern-tip decode
    (bits_of bit walk, reference set_tipclv src/pll.c:925-931): one-hot
    tips exercise only single-bit codes; this drives IUPAC R/Y/N/gap and
    protein B/Z/X masks against the XLA forward on tip CLVs built from
    the SAME masks."""
    from libpll_tpu.engine.evaluate import make_forward, make_score_unbounded
    from libpll_tpu.io.maps import tipmask_to_clv

    rng = np.random.default_rng(300 + states)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(12, rng), sites=128, states=states,
        seed=300 + states)
    t = topo.schedule.tips
    sites = clv.shape[-1]

    if states == 4:
        pool = np.array([1, 2, 4, 8, 5, 10, 9, 6, 15], np.uint32)
    else:
        full = (1 << states) - 1
        pool = np.array([1 << k for k in range(states)]
                        + [(1 << 2) | (1 << 11), (1 << 3) | (1 << 13),
                           full], np.uint32)
    masks = pool[rng.integers(0, len(pool), (t, sites))]

    clv_np = np.array(clv)
    for i in range(t):
        clv_np[i] = np.broadcast_to(
            np.asarray(tipmask_to_clv(masks[i], states)).T[None],
            clv_np[i].shape)
    want, _ = make_forward(topo)(model, jnp.asarray(clv_np), scalers)

    score = make_score_unbounded(topo, 4, states, masks, interpret=True)
    np.testing.assert_allclose(float(score(model)), float(want), rtol=2e-5)
