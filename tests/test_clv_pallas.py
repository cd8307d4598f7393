"""Parity tests for the fused Pallas sweep (ops/clv_pallas.py) against the
XLA level sweep — the rebuild's analog of libpll's generic-vs-SIMD kernel
cross-validation (`test/runtest.py:43-52` runs every test under all arches
against one golden file).

Run in Pallas interpreter mode on the CPU test mesh; the compiled TPU path
is exercised by bench.py / the driver's graft entry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libpll_tpu.engine.evaluate import _pmatrices, topology_from_tree
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.models.gtr import eigen_decompose
from libpll_tpu.ops import clv_pallas as cp
from libpll_tpu.ops.sweep import make_level_sweep
from libpll_tpu.tree import utree as ut
from libpll_tpu.utils.constants import SCALE_NONE, SCALE_PER_SITE


def _random_tree_newick(tips, rng):
    items = [f"t{i}:{rng.uniform(0.05, 0.5):.4f}" for i in range(tips)]
    while len(items) > 3:
        i, j = sorted(rng.choice(len(items), 2, replace=False))
        b = items.pop(j)
        a = items.pop(i)
        items.append(f"({a},{b}):{rng.uniform(0.05, 0.5):.4f}")
    return f"({items[0]},{items[1]},{items[2]});"


def _caterpillar_newick(tips):
    s = "(t0:0.1,t1:0.1)"
    for i in range(2, tips - 2):
        s = f"({s}:0.1,t{i}:0.1)"
    return f"({s}:0.1,t{tips - 2}:0.1,t{tips - 1}:0.1);"


def _setup(newick, sites, rate_cats, states, scale_mode, dtype, seed=0):
    rng = np.random.default_rng(seed)
    tree = ut.parse_newick_string(newick)
    tips = tree.tip_count
    topo, branches = topology_from_tree(tree, sites, scale_mode=scale_mode)

    n_params = states * (states - 1) // 2
    params = rng.uniform(0.5, 2.0, n_params)
    freqs = rng.uniform(0.1, 1.0, states)
    freqs /= freqs.sum()
    w, left, right = eigen_decompose(params, freqs)
    rates = compute_gamma_cats(1.0, rate_cats)
    model = {
        "branch_lengths": jnp.asarray(branches, dtype),
        "rates": jnp.asarray(rates, dtype),
        "prop_invar": jnp.zeros((1,), dtype),
        "params_indices": jnp.zeros(rate_cats, np.int32),
        "eigenvals": jnp.asarray(w[None], dtype),
        "left": jnp.asarray(left[None], dtype),
        "right": jnp.asarray(right[None], dtype),
    }
    pmatrix = _pmatrices(model, topo, dtype)

    nodes = 2 * tips - 2
    clv = np.zeros((nodes, rate_cats, states, sites), dtype)
    st = rng.integers(0, states, (tips, sites))
    clv[:tips] = np.eye(states, dtype=dtype)[st].transpose(0, 2, 1)[:, None]
    clv = jnp.asarray(clv)
    scalers = jnp.zeros((topo.schedule.n_inner + 1, sites), jnp.int32)
    return topo, pmatrix, clv, scalers


@pytest.mark.parametrize("impl", ["mxu", "vpu"])
@pytest.mark.parametrize("scale_mode", [SCALE_PER_SITE, SCALE_NONE])
def test_fused_sweep_matches_xla(impl, scale_mode):
    rng = np.random.default_rng(3)
    topo, pmatrix, clv, scalers = _setup(
        _random_tree_newick(16, rng), 256, 4, 4, scale_mode, jnp.float32)
    tips = topo.schedule.tips

    clv_ref, scal_ref = make_level_sweep(topo.schedule, scale_mode)(
        clv, scalers, pmatrix)

    sweep = cp.make_fused_sweep(topo.schedule, scale_mode, impl=impl,
                                rate_cats=4, states=4, block_sites=128,
                                interpret=True)
    inner, scal = sweep(cp.pack_tips(clv[:tips], impl), pmatrix)
    got = cp.unpack_clv(inner, 4, 4, impl)

    if impl == "mxu":
        # identical contraction order -> bit-exact
        assert jnp.array_equal(clv_ref[tips:], got)
    else:
        ref = np.asarray(clv_ref[tips:])
        np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-6,
                                   atol=float(np.abs(ref).max()) * 1e-6)
    if scale_mode != SCALE_NONE:
        assert jnp.array_equal(scal_ref, scal)


def test_fused_sweep_scaling_events_exact():
    """Deep caterpillar in f32 (2**-64 threshold) forces many scaling
    events; counters must agree exactly with the XLA path."""
    topo, pmatrix, clv, scalers = _setup(
        _caterpillar_newick(96), 128, 4, 4, SCALE_PER_SITE, jnp.float32,
        seed=1)
    tips = topo.schedule.tips

    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_SITE)(
        clv, scalers, pmatrix)
    assert int(np.asarray(scal_ref)[:-1].sum()) > 1000  # scaling did fire

    sweep = cp.make_fused_sweep(topo.schedule, SCALE_PER_SITE, impl="mxu",
                                rate_cats=4, states=4, block_sites=128,
                                interpret=True)
    inner, scal = sweep(cp.pack_tips(clv[:tips], "mxu"), pmatrix)
    assert jnp.array_equal(clv_ref[tips:], cp.unpack_clv(inner, 4, 4, "mxu"))
    assert jnp.array_equal(scal_ref, scal)


def test_fused_sweep_protein_states():
    """20-state (protein-sized) partitions go through the MXU block-diag
    path with C*S = 80 rows."""
    rng = np.random.default_rng(5)
    topo, pmatrix, clv, scalers = _setup(
        _random_tree_newick(8, rng), 128, 4, 20, SCALE_PER_SITE,
        jnp.float32, seed=5)
    tips = topo.schedule.tips

    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_SITE)(
        clv, scalers, pmatrix)
    sweep = cp.make_fused_sweep(topo.schedule, SCALE_PER_SITE, impl="auto",
                                rate_cats=4, states=20, block_sites=128,
                                interpret=True)
    inner, scal = sweep(cp.pack_tips(clv[:tips], "mxu"), pmatrix)
    assert jnp.array_equal(clv_ref[tips:], cp.unpack_clv(inner, 4, 20, "mxu"))
    assert jnp.array_equal(scal_ref, scal)


@pytest.mark.parametrize("impl", ["mxu", "vpu"])
def test_fused_edge_score_matches(impl):
    """The in-kernel edge logL (tree-search scoring primitive) equals the
    XLA forward's logL."""
    from libpll_tpu.engine.evaluate import make_forward, make_score

    rng = np.random.default_rng(11)
    sites, rate_cats, states = 256, 4, 4
    tree = ut.parse_newick_string(_random_tree_newick(12, rng))
    tips = tree.tip_count
    topo, branches = topology_from_tree(tree, sites,
                                        scale_mode=SCALE_PER_SITE)

    params = rng.uniform(0.5, 2.0, 6)
    freqs = rng.uniform(0.1, 1.0, 4)
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
        "freqs_pc": jnp.asarray(np.broadcast_to(freqs, (rate_cats, 4)),
                                dtype),
        "prop_invar_pc": jnp.zeros((rate_cats,), dtype),
        "rate_weights": jnp.full((rate_cats,), 1.0 / rate_cats, dtype),
        "pattern_weights": jnp.ones((sites,), dtype),
        "invariant": jnp.full((sites,), -1, jnp.int32),
    }
    nodes = 2 * tips - 2
    clv = np.zeros((nodes, rate_cats, 4, sites), np.float32)
    st = rng.integers(0, 4, (tips, sites))
    clv[:tips] = np.eye(4, dtype=np.float32)[st].transpose(0, 2, 1)[:, None]
    clv = jnp.asarray(clv)
    scalers = jnp.zeros((topo.schedule.n_inner + 1, sites), jnp.int32)

    logl_ref, _ = make_forward(topo)(model, clv, scalers)
    score = make_score(topo, rate_cats, 4, impl=impl, interpret=True)
    logl = score(model, cp.pack_tips(clv[:tips], impl))
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-6)


def test_fused_forward_logl_matches():
    """End-to-end: fused forward logL == XLA forward logL."""
    from libpll_tpu.engine.evaluate import make_forward, make_forward_fused

    rng = np.random.default_rng(7)
    sites, rate_cats, states = 256, 4, 4
    tree = ut.parse_newick_string(_random_tree_newick(12, rng))
    tips = tree.tip_count
    topo, branches = topology_from_tree(tree, sites,
                                        scale_mode=SCALE_PER_SITE)

    params = rng.uniform(0.5, 2.0, 6)
    freqs = rng.uniform(0.1, 1.0, 4)
    freqs /= freqs.sum()
    w, left, right = eigen_decompose(params, freqs)
    rates = compute_gamma_cats(1.0, rate_cats)
    dtype = jnp.float32
    model = {
        "branch_lengths": jnp.asarray(branches, dtype),
        "rates": jnp.asarray(rates, dtype),
        "prop_invar": jnp.zeros((1,), dtype),
        "params_indices": jnp.zeros(rate_cats, np.int32),
        "eigenvals": jnp.asarray(w[None], dtype),
        "left": jnp.asarray(left[None], dtype),
        "right": jnp.asarray(right[None], dtype),
        "freqs_pc": jnp.asarray(np.broadcast_to(freqs, (rate_cats, 4)),
                                dtype),
        "prop_invar_pc": jnp.zeros((rate_cats,), dtype),
        "rate_weights": jnp.full((rate_cats,), 1.0 / rate_cats, dtype),
        "pattern_weights": jnp.ones((sites,), dtype),
        "invariant": jnp.full((sites,), -1, jnp.int32),
    }

    nodes = 2 * tips - 2
    clv = np.zeros((nodes, rate_cats, 4, sites), np.float32)
    st = rng.integers(0, 4, (tips, sites))
    clv[:tips] = np.eye(4, dtype=np.float32)[st].transpose(0, 2, 1)[:, None]
    clv = jnp.asarray(clv)
    scalers = jnp.zeros((topo.schedule.n_inner + 1, sites), jnp.int32)

    logl_ref, _ = make_forward(topo)(model, clv, scalers)
    fwd = make_forward_fused(topo, rate_cats, 4, impl="mxu", interpret=True)
    logl, _, _, _ = fwd(model, cp.pack_tips(clv[:tips], "mxu"))
    assert np.isfinite(float(logl))
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=1e-6)


def test_fused_train_step_matches():
    """Fused-path Newton step == XLA-path Newton step (logL and t*)."""
    from libpll_tpu.engine.evaluate import (make_train_step,
                                            make_train_step_fused)
    import sys
    sys.path.insert(0, "tests")
    from test_clv_pallas_seg import _build, _random_tree_newick as _rtn

    rng = np.random.default_rng(4)
    topo, model, pmatrix, clv, scalers = _build(_rtn(10, rng), sites=256,
                                                seed=4)
    t = topo.schedule.tips
    logl_ref, tstar_ref, _, _ = make_train_step(topo)(model, clv, scalers)
    step = make_train_step_fused(topo, 4, 4, impl="mxu", interpret=True)
    logl, tstar = step(model, cp.pack_tips(clv[:t], "mxu"))
    np.testing.assert_allclose(float(logl), float(logl_ref), rtol=2e-6)
    np.testing.assert_allclose(float(tstar), float(tstar_ref), rtol=1e-4)


@pytest.mark.parametrize("impl", ["mxu", "vpu"])
def test_fused_sweep_per_rate_scaling(impl):
    """PLL_ATTRIB_RATE_SCALERS on the fused path: per-(site,rate) counters
    must match the XLA per-rate sweep exactly (deep caterpillar forces
    many events)."""
    from libpll_tpu.utils.constants import SCALE_PER_RATE

    topo, pmatrix, clv, _ = _setup(_caterpillar_newick(64), 128, 4, 4,
                                   SCALE_PER_RATE, jnp.float32, seed=1)
    tips = topo.schedule.tips
    scalers = jnp.zeros((topo.schedule.n_inner + 1, 4, 128), jnp.int32)
    clv_ref, scal_ref = make_level_sweep(topo.schedule, SCALE_PER_RATE)(
        clv, scalers, pmatrix)
    assert int(np.asarray(scal_ref)[:-1].sum()) > 10000

    sweep = cp.make_fused_sweep(topo.schedule, SCALE_PER_RATE, impl=impl,
                                rate_cats=4, states=4, block_sites=128,
                                interpret=True)
    inner, scal = sweep(cp.pack_tips(clv[:tips], impl), pmatrix)
    got = np.asarray(cp.unpack_clv(inner, 4, 4, impl))
    ref = np.asarray(clv_ref[tips:])
    sm = np.abs(ref).max(axis=(1, 2), keepdims=True)
    assert (np.abs(ref - got) / np.maximum(sm, 1e-300)).max() < 1e-5
    assert np.array_equal(np.asarray(scal_ref), np.asarray(scal))


def test_model_from_partition_bridge():
    """model_from_partition: the fused-pipeline model dict built from a
    Partition reproduces the step-by-step API's logL exactly."""
    import libpll_tpu as pll
    from libpll_tpu.engine.evaluate import (make_forward,
                                            model_from_partition)

    tree = ut.parse_newick_string(
        "((A:0.1,B:0.2):0.3,(C:0.4,D:0.5):0.6,E:0.7);")
    seqs = {"A": "ACGTACGTACGTACGT", "B": "ACGTACGTTCGTACGA",
            "C": "ACGAACGTACGAACGT", "D": "CCGTACGTACGTACTT",
            "E": "ACGTACGGACGTACGT"}
    part = pll.Partition(5, 3, 4, 16, 1, 7, 4, 3)
    trav = ut.traverse(tree.root)
    order = {n.label: n.clv_index for n in trav if n.label}
    for lab in sorted(seqs):
        part.set_tip_states(order[lab], pll.maps.pll_map_nt, seqs[lab])
    part.set_frequencies(0, [0.3, 0.25, 0.25, 0.2])
    part.set_subst_params(0, [1.2, 2.4, 0.9, 1.1, 3.0, 1.0])
    part.set_category_rates(compute_gamma_cats(0.8, 4))
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * 4, midx, blens)
    part.update_partials(ops)
    r = tree.root
    logl_api = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index,
        r.back.scaler_index, r.pmatrix_index, [0] * 4)

    topo, branches = topology_from_tree(tree, 16)
    model = model_from_partition(part, branches, dtype=jnp.float64)
    lm = np.zeros((part.clv.shape[0],), np.int64)
    for orig, row in topo.schedule.clv_map.items():
        lm[row] = orig
    clv_lm = jnp.asarray(part.clv)[jnp.asarray(lm)]
    scalers = jnp.zeros((topo.schedule.n_inner + 1, 16), jnp.int32)
    logl_fwd, _ = make_forward(topo)(model, clv_lm, scalers)
    assert abs(logl_api - float(logl_fwd)) < 1e-9


@pytest.mark.parametrize("asc_mode", [1, 2, 3])  # Lewis/Felsenstein/Stam.
def test_fused_forward_asc_bias(asc_mode):
    """Asc-bias on the fused pipeline: the S pseudo-site columns ride the
    site axis through the Pallas sweep (with ones-padding up to the kernel
    block, pad_sites_packed), and match the step-by-step API exactly."""
    import libpll_tpu as pll
    from libpll_tpu.engine.evaluate import (make_forward_fused,
                                            model_from_partition)

    rng = np.random.default_rng(asc_mode)
    sites, rate_cats = 40, 4
    tree = ut.parse_newick_string(_random_tree_newick(8, rng))
    tips = tree.tip_count
    part = pll.Partition(tips, tips - 2, 4, sites, 1, 2 * tips - 3,
                         rate_cats, tips - 2, asc_bias_alloc=True)
    part.set_asc_bias_type(asc_mode)
    part.set_frequencies(0, [0.3, 0.25, 0.25, 0.2])
    part.set_subst_params(0, rng.uniform(0.5, 2.0, 6))
    part.set_category_rates(compute_gamma_cats(0.9, rate_cats))
    if asc_mode == 3:
        part.set_asc_state_weights(np.asarray([3, 1, 2, 4], np.uint32))
    trav = ut.traverse(tree.root)
    order = {n.label: n.clv_index for n in trav if n.label}
    for lab in sorted(order):
        part.set_tip_states(order[lab], pll.maps.pll_map_nt,
                            "".join(rng.choice(list("ACGT"), sites)))
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * rate_cats, midx, blens)
    part.update_partials(ops)
    r = tree.root
    logl_api = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index,
        r.back.scaler_index, r.pmatrix_index, [0] * rate_cats)

    topo, branches = topology_from_tree(tree, sites,
                                        asc_mode=asc_mode)
    model = model_from_partition(part, branches)  # float32 fast path
    lm = np.zeros((part.clv.shape[0],), np.int64)
    for orig, row in topo.schedule.clv_map.items():
        lm[row] = orig
    tips_clv = jnp.asarray(np.asarray(part.clv)[lm[:tips]], jnp.float32)
    packed = cp.pad_sites_packed(cp.pack_tips(tips_clv, "mxu"))
    assert packed.shape[-1] == 128  # 44 allocated columns -> one block
    fwd = make_forward_fused(topo, rate_cats, 4, impl="mxu",
                             interpret=True)
    logl, _, _, _ = fwd(model, packed)
    np.testing.assert_allclose(float(logl), float(logl_api), rtol=5e-5)


@pytest.mark.parametrize("states,encoding,impl", [
    (4, "chars", "vpu"),    # nibble-packed DNA codes
    (20, "masks", "mxu"),   # protein ambiguity bitmasks
])
def test_fused_score_pattern_tips(states, encoding, impl):
    """In-kernel pattern-tip decode on the fused edge score (the rebuild's
    PLL_ATTRIB_PATTERN_TIP; reference src/pll.c:825-903): nibble codes /
    bitmask words decoded to 0/1 CLV rows per use, matching the XLA
    forward exactly."""
    from libpll_tpu.engine.evaluate import make_forward, make_score
    from test_clv_pallas_seg import _build as _build_seg

    rng = np.random.default_rng(states)
    topo, model, pmatrix, clv, scalers = _build_seg(
        _random_tree_newick(10, rng), sites=128, states=states)
    t = topo.schedule.tips
    want, _ = make_forward(topo)(model, clv, scalers)

    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(states, dtype=np.uint32)[None, :, None]).sum(1)
    score = make_score(topo, 4, states, impl=impl, tip_encoding=encoding,
                       interpret=True)
    tp = (cp.pack_tipchars(masks) if encoding == "chars"
          else jnp.asarray(masks.astype(np.int32)))
    got = float(score(model, tp))
    np.testing.assert_allclose(got, float(want), rtol=2e-5)


@pytest.mark.parametrize("states,encoding,impl", [
    (4, "chars", "vpu"),    # IUPAC multi-bit nibble codes
    (20, "masks", "mxu"),   # protein B/Z/X multi-bit masks
])
def test_fused_score_ambiguity_codes(states, encoding, impl):
    """Multi-bit ambiguity/gap codes through the pattern-tip fast paths.

    The roll-free vpu tip term (tip_coeff_pmatrices) accumulates one
    broadcast FMA per SET bit; one-hot tips exercise only a single term
    of that sum, so this test drives IUPAC-style codes (R/Y/N/gap — the
    reference's pll_map_nt ambiguity rows, src/maps.c) and the protein
    B/Z/X equivalents, checking against the XLA forward on tip CLVs
    built from the SAME masks (io.maps.tipmask_to_clv semantics:
    set_tipclv bit walk, src/pll.c:925-931)."""
    from libpll_tpu.engine.evaluate import make_forward, make_score
    from libpll_tpu.io.maps import tipmask_to_clv
    from test_clv_pallas_seg import _build as _build_seg

    rng = np.random.default_rng(100 + states)
    topo, model, pmatrix, clv, scalers = _build_seg(
        _random_tree_newick(10, rng), sites=128, states=states)
    t = topo.schedule.tips
    sites = clv.shape[-1]

    if states == 4:
        # A C G T  R=A|G  Y=C|T  W  S  N/gap
        pool = np.array([1, 2, 4, 8, 5, 10, 9, 6, 15], np.uint32)
    else:
        full = (1 << states) - 1
        pool = np.array([1 << k for k in range(states)]
                        + [(1 << 2) | (1 << 11),   # B = D|N (aa order)
                           (1 << 3) | (1 << 13),   # Z = E|Q
                           full], np.uint32)       # X / gap
    masks = pool[rng.integers(0, len(pool), (t, sites))]

    # install the equivalent 0/1 CLVs for the XLA reference forward
    clv_np = np.array(clv)
    for i in range(t):
        clv_np[i] = np.broadcast_to(
            np.asarray(tipmask_to_clv(masks[i], states)).T[None],
            clv_np[i].shape)
    want, _ = make_forward(topo)(model, jnp.asarray(clv_np), scalers)

    score = make_score(topo, 4, states, impl=impl, tip_encoding=encoding,
                       interpret=True)
    tp = (cp.pack_tipchars(masks) if encoding == "chars"
          else jnp.asarray(masks.astype(np.int32)))
    got = float(score(model, tp))
    np.testing.assert_allclose(got, float(want), rtol=2e-5)


@pytest.mark.parametrize("states,encoding,impl", [
    (4, "chars", "vpu"),
    (20, "masks", "mxu"),
    (4, "masks", "vpu"),
])
def test_fused_sweep_pattern_tips(states, encoding, impl):
    """make_fused_sweep(tip_encoding=...): pattern tips (nibble codes /
    bitmask words, incl. multi-bit ambiguities) through the all-CLVs-out
    sweep.  Scalers must be bit-identical to the "clv" encoding; inner
    CLVs agree to f32 tolerance (the VPU tip term sums ambiguity bits in
    child-state order, the roll contraction in rotated order)."""
    from libpll_tpu.io.maps import tipmask_to_clv
    from test_clv_pallas_seg import _build as _build_seg

    rng = np.random.default_rng(500 + states)
    topo, model, pmatrix, clv, scalers = _build_seg(
        _random_tree_newick(12, rng), sites=128, states=states,
        seed=500 + states)
    t = topo.schedule.tips
    sites = clv.shape[-1]

    if states == 4:
        pool = np.array([1, 2, 4, 8, 5, 10, 9, 6, 15], np.uint32)
    else:
        pool = np.array([1 << k for k in range(states)]
                        + [(1 << 2) | (1 << 11), (1 << states) - 1],
                        np.uint32)
    masks = pool[rng.integers(0, len(pool), (t, sites))]

    clv_np = np.array(clv)
    for i in range(t):
        clv_np[i] = np.broadcast_to(
            np.asarray(tipmask_to_clv(masks[i], states)).T[None],
            clv_np[i].shape)

    sweep_ref = cp.make_fused_sweep(topo.schedule, topo.scale_mode,
                                    impl=impl, rate_cats=4, states=states,
                                    interpret=True)
    tp_ref = cp.pack_tips(jnp.asarray(clv_np[:t]), impl)
    want_inner, want_scal = sweep_ref(tp_ref, pmatrix)

    sweep_pt = cp.make_fused_sweep(topo.schedule, topo.scale_mode,
                                   impl=impl, rate_cats=4, states=states,
                                   tip_encoding=encoding, interpret=True)
    tp = (cp.pack_tipchars(masks) if encoding == "chars"
          else jnp.asarray(masks.astype(np.int32)))
    got_inner, got_scal = sweep_pt(tp, pmatrix)

    np.testing.assert_array_equal(np.asarray(got_scal),
                                  np.asarray(want_scal))
    np.testing.assert_allclose(np.asarray(got_inner),
                               np.asarray(want_inner), rtol=2e-5,
                               atol=1e-30)
