"""Randomized composite-configuration parity fuzz vs the compiled oracle.

The targeted parity suites each pin one feature axis (scaling, asc, pinv,
alphabet, depth...).  This module draws whole random *combinations* —
random binary topology x alphabet x rate categories x rate-matrix count x
scaling mode x asc flavor x prop-invar x pattern weights x ambiguous
sequences — and demands f64 agreement with the reference
(pll_update_partials -> pll_compute_edge_loglikelihood ->
pll_update_sumtable -> pll_compute_likelihood_derivatives;
/root/reference/src/partials.c:177, likelihood.c:478, derivatives.c:164)
on every draw.  This is the cross-feature-interaction net the reference's
golden matrix (runtest.py attribute combinations) casts over its SIMD
kernels, cast here over the rebuild's semantic surface.
"""

import numpy as np
import pytest

import oracle

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

import libpll_tpu as pll
from libpll_tpu.io import maps
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.tree import utree as ut

ASC_ATTR = {"lewis": (1 << 5) | (1 << 8),
            "felsenstein": (2 << 5) | (1 << 8),
            "stamatakis": (3 << 5) | (1 << 8)}
ASC_MODE = {"lewis": pll.ASC_LEWIS, "felsenstein": pll.ASC_FELSENSTEIN,
            "stamatakis": pll.ASC_STAMATAKIS}
RATE_SCALERS_ATTR = 1 << 9  # PLL_ATTRIB_RATE_SCALERS (pll.h:122)

DNA_ALPHABET = list("ACGT") * 5 + list("-RYKMN")  # mostly definite states
AA_ALPHABET = list("ARNDCQEGHILKMFPSTWYV") * 2 + list("X-B")


def _random_newick(tips, rng):
    items = [f"t{i}:{rng.uniform(0.05, 0.6):.4f}" for i in range(tips)]
    while len(items) > 3:
        i, j = sorted(rng.choice(len(items), 2, replace=False))
        b = items.pop(j)
        a = items.pop(i)
        items.append(f"({a},{b}):{rng.uniform(0.05, 0.6):.4f}")
    return f"({items[0]},{items[1]},{items[2]});"


def _draw_config(seed):
    rng = np.random.default_rng(seed)
    states = int(rng.choice([4, 4, 4, 20]))
    cfg = {
        "rng": rng,
        "states": states,
        "tips": int(rng.integers(6, 17)),
        "sites": int(rng.integers(24, 97)),
        "rate_cats": int(rng.choice([1, 4])),
        "n_rm": int(rng.choice([1, 2])),  # rate matrices (LG4-style mixing)
        "scaling": str(rng.choice(["site", "rate"])),
        "asc": rng.choice([None, "lewis", "felsenstein", "stamatakis"]),
        "weights": bool(rng.integers(2)),
    }
    if cfg["n_rm"] == 2 and cfg["rate_cats"] == 1:
        cfg["n_rm"] = 1  # one category can only address one matrix
    # prop-invar and asc-bias are mutually exclusive in the reference
    # (models.c:402-451 rejects the combination)
    cfg["pinv"] = 0.0 if cfg["asc"] is not None else float(
        rng.choice([0.0, 0.3]))
    return cfg


def _build_pair(cfg):
    """Identical reference + rebuild partitions on a random topology.
    Returns (ref, mine, pidx, root) with all CLVs updated."""
    rng, states, tips = cfg["rng"], cfg["states"], cfg["tips"]
    sites, rate_cats = cfg["sites"], cfg["rate_cats"]

    tree = ut.parse_newick_string(_random_newick(tips, rng))
    root = tree.nodes[-1] if not tree.nodes[-1].is_tip else tree.root
    trav = ut.traverse(root)
    ops, blens, midx = ut.create_operations(trav)
    n_mat = 2 * tips - 3

    attribs = ASC_ATTR[cfg["asc"]] if cfg["asc"] else 0
    if cfg["scaling"] == "rate":
        attribs |= RATE_SCALERS_ATTR
    ref = oracle.RefPartition(tips, tips - 2, states, sites, cfg["n_rm"],
                              n_mat, rate_cats, tips - 2,
                              attributes=attribs)
    mine = pll.Partition(tips, tips - 2, states, sites, cfg["n_rm"],
                         n_mat, rate_cats, tips - 2,
                         scaling=cfg["scaling"],
                         asc_bias_alloc=cfg["asc"] is not None)
    if cfg["asc"]:
        mine.set_asc_bias_type(ASC_MODE[cfg["asc"]])
        w = rng.integers(1, 6, states).astype(np.uint32)
        ref.set_asc_state_weights(w)
        mine.set_asc_state_weights(w)

    for m in range(cfg["n_rm"]):
        n_params = states * (states - 1) // 2
        params = rng.uniform(0.2, 3.0, n_params)
        freqs = rng.uniform(0.1, 1.0, states)
        freqs /= freqs.sum()
        for part in (ref, mine):
            part.set_frequencies(m, freqs)
            part.set_subst_params(m, params)

    rates = (compute_gamma_cats(rng.uniform(0.4, 2.0), rate_cats)
             if rate_cats > 1 else np.ones(1))
    ref.set_category_rates(rates)
    mine.set_category_rates(rates)

    alphabet = DNA_ALPHABET if states == 4 else AA_ALPHABET
    charmap = maps.pll_map_nt if states == 4 else maps.pll_map_aa
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    # +I demands at least one invariant site; plant constant columns
    const_cols = ("ACGA" if states == 4 else "LKV") if cfg["pinv"] else ""
    for i in range(tips):
        seq = const_cols + "".join(rng.choice(alphabet,
                                              sites - len(const_cols)))
        ref.set_tip_states(order[f"t{i}"], charmap, seq)
        mine.set_tip_states(order[f"t{i}"], charmap, seq)

    if cfg["weights"]:
        w = rng.integers(1, 5, sites).astype(np.uint32)
        ref.set_pattern_weights(w)
        mine.set_pattern_weights(w)

    if cfg["pinv"]:
        for m in range(cfg["n_rm"]):
            ref.set_invariant_proportion(m, cfg["pinv"])
            mine.update_invariant_sites_proportion(m, cfg["pinv"])

    pidx = (rng.integers(0, cfg["n_rm"], rate_cats)
            if cfg["n_rm"] > 1 else np.zeros(rate_cats, int))
    ref.update_prob_matrices(pidx, np.arange(n_mat), np.asarray(blens))
    mine.update_prob_matrices(pidx, np.arange(n_mat), np.asarray(blens))
    ref.update_partials([op.as_tuple() for op in ops])
    mine.update_partials(ops)
    return ref, mine, pidx, root


@pytest.mark.parametrize("seed", range(100, 120))
def test_fuzz_composite_config_parity(seed):
    cfg = _draw_config(seed)
    ref, mine, pidx, root = _build_pair(cfg)

    edge = (root.clv_index, root.scaler_index, root.back.clv_index,
            root.back.scaler_index, root.pmatrix_index)
    ref_logl = ref.edge_loglikelihood(*edge, pidx)
    my_logl = mine.compute_edge_loglikelihood(*edge, pidx)
    np.testing.assert_allclose(my_logl, ref_logl, rtol=1e-10,
                               err_msg=f"edge logL, cfg={cfg}")

    if cfg["scaling"] == "site" and cfg["asc"] is None:
        # per-rate root logL is unsupported in the reference; its asc root
        # paths are exercised by the dedicated asc suite
        ref_r = ref.root_loglikelihood(root.clv_index, root.scaler_index,
                                       pidx)
        my_r = mine.compute_root_loglikelihood(root.clv_index,
                                               root.scaler_index, pidx)
        np.testing.assert_allclose(my_r, ref_r, rtol=1e-10,
                                   err_msg=f"root logL, cfg={cfg}")

    # analytic branch-length derivatives across the same edge
    ref_st = ref.sumtable(root.clv_index, root.back.clv_index,
                          root.scaler_index, root.back.scaler_index, pidx)
    my_st = mine.update_sumtable(root.clv_index, root.back.clv_index,
                                 root.scaler_index, root.back.scaler_index,
                                 pidx)
    for t in (0.05, 0.9, 7.0):
        d1_ref, d2_ref = ref.likelihood_derivatives(
            root.scaler_index, root.back.scaler_index, t, pidx, ref_st)
        d1, d2 = mine.compute_likelihood_derivatives(
            root.scaler_index, root.back.scaler_index, t, pidx, my_st)
        np.testing.assert_allclose(
            [d1, d2], [d1_ref, d2_ref], rtol=1e-7, atol=1e-9,
            err_msg=f"derivatives at t={t}, cfg={cfg}")
