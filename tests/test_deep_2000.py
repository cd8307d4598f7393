"""2000-taxon deep-tree parity vs the compiled oracle — the scale shape of
the reference's fixture-bound test programs asc-bias.c and scaling.c.

Both programs require download-time fixtures (``testdata/2000.tree`` /
``2000.fas``) that are absent offline, so they cannot be golden-diffed
(reference test/src/asc-bias.c:33-34, scaling.c:30 — see also
test/src/README.md).  Their *shape* is replicated here on synthetic data at
full 2000-taxon depth, with the compiled reference as the expected side:

``test_scaling_deep``
    scaling.c step-for-step (test/src/scaling.c:263-369): generated
    sequences over 3 alphabets (DNA / AA-LG / odd-5), per-site vs per-rate
    scalers, extreme alphas, alternating 1.0 / 1e-6 branch lengths on a
    2000-taxon caterpillar (deep enough that scalers actually fire —
    asserted).  Compared per config: the root scaler vector itself,
    per-site logLs, INNER-INNER vs TIP-INNER edge logLs (and their
    agreement), and first/second derivatives.

``test_asc_bias_deep``
    asc-bias.c step-for-step (test/src/asc-bias.c:77-168): all three asc
    corrections (+ none) under active per-site scaling, sumtable +
    derivative grids over the same 7 branch lengths {1e-4..100}, edge logL
    re-evaluated at every grid point, across re-rootings.
"""

import sys

import numpy as np
import pytest

import oracle

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

import libpll_tpu as pll
from libpll_tpu.io import maps
from libpll_tpu.models import aa_tables
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.tree import utree as ut

from test_golden_suite import ODD5_MAP

# the caterpillar tree is ~2000 nodes deep; traversal/parse recurse
sys.setrecursionlimit(200000)

TAXA = 2000
RATE_CATS = 4
PIDX = np.zeros(RATE_CATS, int)

RATE_SCALER_ATTR = 1 << 9        # PLL_ATTRIB_RATE_SCALERS (pll.h:122)
AB_FLAG = 1 << 8                 # PLL_ATTRIB_AB_FLAG (pll.h:120)
ASC_ATTR = {"none": 0, "lewis": 1 << 5, "felsenstein": 2 << 5,
            "stamatakis": 3 << 5}
ASC_MODE = {"none": pll.ASC_NONE, "lewis": pll.ASC_LEWIS,
            "felsenstein": pll.ASC_FELSENSTEIN,
            "stamatakis": pll.ASC_STAMATAKIS}

# scaling.c:38-52 model constants
NT_ALPHABET = "ACGT-"
AA_ALPHABET = "GALMFWKQESPVICYHRNDT"
ODD_ALPHABET = "ABCDE"
NT_FREQS = np.array([0.4, 0.4, 0.1, 0.1])
NT_PARAMS = np.array([0.1, 10., 10., 0.1, 0.1, 1])
ODD_FREQS = np.array([0.3, 0.25, 0.1, 0.2, 0.15])
ODD_PARAMS = np.array([1.452176, 0.937951, 0.462880, 0.617729, 1.745312,
                       0.937951, 0.462880, 0.617729, 1.745312, 1.000000])


def _caterpillar_newick(tips):
    s = "(t0:0.1,t1:0.1)"
    for i in range(2, tips - 2):
        s = f"({s}:0.1,t{i}:0.1)"
    return f"({s}:0.1,t{tips - 2}:0.1,t{tips - 1}:0.1);"


def _deep_tree():
    """Parsed 2000-taxon caterpillar + its fixed traversal structures
    (the init() phase of scaling.c:186-238)."""
    tree = ut.parse_newick_string(_caterpillar_newick(TAXA))
    root = tree.nodes[-1]          # last inner node, as in the reference
    trav = ut.traverse(root)
    ops, _, midx = ut.create_operations(trav)
    branch_count = 2 * TAXA - 3
    # scaling.c:237-238: alternating long/epsilon branch lengths
    blens = np.where(np.arange(len(midx)) % 2 == 0, 1.0, 1e-6)
    return tree, root, ops, np.asarray(midx), blens


_DEEP = None


def deep_tree():
    global _DEEP
    if _DEEP is None:
        _DEEP = _deep_tree()
    return _DEEP


# ---------------------------------------------------------------------------
# scaling.c
# ---------------------------------------------------------------------------
def _datatype(name):
    if name == "nt":
        return 4, maps.pll_map_nt, NT_ALPHABET, NT_FREQS, NT_PARAMS
    if name == "aa":
        return (20, maps.pll_map_aa, AA_ALPHABET,
                aa_tables.AA_FREQS_LG, aa_tables.AA_RATES_LG)
    return 5, ODD5_MAP, ODD_ALPHABET, ODD_FREQS, ODD_PARAMS


def _scaling_partitions(datatype, scaling, sites=5):
    """init_partition() of scaling.c:118-185 on both sides."""
    states, charmap, alphabet, freqs, params = _datatype(datatype)
    tree, root, ops, midx, blens = deep_tree()
    inner = tree.inner_count
    attrs = RATE_SCALER_ATTR if scaling == "rate" else 0
    ref = oracle.RefPartition(TAXA, inner, states, sites, 1,
                              2 * TAXA - 3, RATE_CATS, inner,
                              attributes=attrs)
    mine = pll.Partition(TAXA, inner, states, sites, 1,
                         2 * TAXA - 3, RATE_CATS, inner, scaling=scaling)
    L = len(alphabet)
    for i in range(TAXA):
        # scaling.c:172-177: repetitive for the first 1500 taxa, shifted after
        seq = "".join(alphabet[(j if i < 1500 else i + j) % L]
                      for j in range(sites))
        ref.set_tip_states(i, charmap, seq)
        mine.set_tip_states(i, charmap, seq)
    for p in (ref, mine):
        p.set_frequencies(0, freqs)
        p.set_subst_params(0, params)
    return ref, mine, root, ops, midx, blens


def _derivs(part, node, brlen=1.0):
    if isinstance(part, oracle.RefPartition):
        st = part.sumtable(node.clv_index, node.back.clv_index,
                           node.scaler_index, node.back.scaler_index, PIDX)
        return part.likelihood_derivatives(node.scaler_index,
                                           node.back.scaler_index,
                                           brlen, PIDX, st)
    st = part.update_sumtable(node.clv_index, node.back.clv_index,
                              node.scaler_index, node.back.scaler_index, PIDX)
    return part.compute_likelihood_derivatives(node.scaler_index,
                                               node.back.scaler_index,
                                               brlen, PIDX, st)


@pytest.mark.parametrize("scaling", ["site", "rate"])
@pytest.mark.parametrize("datatype", ["nt", "aa", "odd"])
def test_scaling_deep(datatype, scaling):
    ref, mine, root, ops, midx, blens = _scaling_partitions(datatype, scaling)
    for alpha in (0.05, 2.0):       # the extreme ends of scaling.c:42
        rates = compute_gamma_cats(alpha, RATE_CATS)
        ref.set_category_rates(rates)
        mine.set_category_rates(rates)
        ref.update_prob_matrices(PIDX, midx, blens)
        mine.update_prob_matrices(PIDX, midx, blens)
        ref.update_partials([o.as_tuple() for o in ops])
        mine.update_partials(ops)

        # the root scaler vector itself (show_scaler, scaling.c:74-105):
        # deep-tree scaling must actually fire, identically on both sides
        sidx = root.back.scaler_index
        ref_scaler = ref.get_scaler(sidx)
        my_scaler = np.asarray(mine.scalers[sidx])
        if scaling == "rate":
            ref_scaler = ref_scaler.reshape(mine.sites, RATE_CATS).T
        assert ref_scaler.sum() > 0, "deep tree must trigger scaling"
        np.testing.assert_array_equal(
            my_scaler.reshape(ref_scaler.shape)[..., :mine.sites], ref_scaler,
            err_msg=f"{datatype}/{scaling}/alpha={alpha} scaler")

        rd1, rd2 = _derivs(ref, root)
        md1, md2 = _derivs(mine, root)
        np.testing.assert_allclose((md1, md2), (rd1, rd2),
                                   rtol=1e-7, atol=1e-9,
                                   err_msg=f"{datatype}/{scaling} derivs")

        ref_ii, ref_ps = ref.edge_loglikelihood(
            root.clv_index, root.scaler_index, root.back.clv_index,
            root.back.scaler_index, root.pmatrix_index, PIDX, persite=True)
        my_ii, my_ps = mine.compute_edge_loglikelihood(
            root.clv_index, root.scaler_index, root.back.clv_index,
            root.back.scaler_index, root.pmatrix_index, PIDX, persite=True)
        np.testing.assert_allclose(my_ps[:mine.sites], ref_ps,
                                   rtol=1e-9, atol=1e-12,
                                   err_msg=f"{datatype}/{scaling} per-site")
        np.testing.assert_allclose(my_ii, ref_ii, rtol=1e-10)

        # re-orient the root CLV toward a tip edge (scaling.c:329-343)
        nr = next(n for n in root.ring() if n.back.is_tip)
        ring = [n for n in nr.ring() if n is not nr]
        reop = pll.Operation(
            nr.clv_index, nr.scaler_index,
            ring[0].back.clv_index, ring[0].back.pmatrix_index,
            ring[0].back.scaler_index,
            ring[1].back.clv_index, ring[1].back.pmatrix_index,
            ring[1].back.scaler_index)
        ref.update_partials([reop.as_tuple()])
        mine.update_partials([reop])
        tip = nr.back
        ref_ti = ref.edge_loglikelihood(
            nr.clv_index, nr.scaler_index, tip.clv_index, tip.scaler_index,
            tip.pmatrix_index, PIDX)
        my_ti = mine.compute_edge_loglikelihood(
            nr.clv_index, nr.scaler_index, tip.clv_index, tip.scaler_index,
            tip.pmatrix_index, PIDX)
        np.testing.assert_allclose(my_ti, ref_ti, rtol=1e-10)
        # scaling.c:363-367: the two orientations agree
        assert abs(my_ii - my_ti) < 1e-4 * max(1.0, abs(my_ii)), \
            (my_ii, my_ti)


# ---------------------------------------------------------------------------
# asc-bias.c
# ---------------------------------------------------------------------------
ASC_FREQS = np.array([0.1, 0.2, 0.3, 0.4])       # asc-bias.c:40
ASC_PARAMS = np.array([1., 5., 1., 1., 5., 1.])  # asc-bias.c:41
INVAR_WEIGHTS = np.array([50, 40, 60, 20], dtype=np.uint32)  # asc-bias.c:44
TEST_BRANCH_LENGTHS = [0.0001, 0.001, 0.01, 0.1, 1.0, 10.0, 100.0]


def _asc_partitions(sites=120):
    tree, root, _, _, _ = deep_tree()
    inner = tree.inner_count
    rng = np.random.default_rng(2000)
    ref = oracle.RefPartition(TAXA, inner, 4, sites, 1, 2 * TAXA - 3,
                              RATE_CATS, inner, attributes=AB_FLAG)
    mine = pll.Partition(TAXA, inner, 4, sites, 1, 2 * TAXA - 3,
                         RATE_CATS, inner, asc_bias_alloc=True)
    for i in range(TAXA):
        seq = "".join(rng.choice(list("ACGT"), sites))
        ref.set_tip_states(i, maps.pll_map_nt, seq)
        mine.set_tip_states(i, maps.pll_map_nt, seq)
    rates = compute_gamma_cats(0.5, RATE_CATS)    # asc-bias.c:177 alpha=0.5
    for p in (ref, mine):
        p.set_frequencies(0, ASC_FREQS)
        p.set_subst_params(0, ASC_PARAMS)
        p.set_category_rates(rates)
    return ref, mine, root


@pytest.mark.parametrize("asc", ["none", "lewis", "felsenstein",
                                 "stamatakis"])
def test_asc_bias_deep(asc):
    ref, mine, first_root = _asc_partitions()
    ref.set_asc_bias_type(ASC_ATTR[asc])
    mine.set_asc_bias_type(ASC_MODE[asc])
    if asc in ("felsenstein", "stamatakis"):
        ref.set_asc_state_weights(INVAR_WEIGHTS)
        mine.set_asc_state_weights(INVAR_WEIGHTS)

    # asc-bias.c:209-212 re-roots via root->next between repetitions
    # (re-rooting exercised once — on lewis — to bound suite runtime)
    roots = (first_root, first_root.next) if asc == "lewis" \
        else (first_root,)
    for root in roots:
        trav = ut.traverse(root)
        ops, blens_t, midx = ut.create_operations(trav)
        midx = np.asarray(midx)
        blens = np.where(np.arange(len(midx)) % 3 == 0, 0.3, 0.05)
        ref.update_prob_matrices(PIDX, midx, blens)
        mine.update_prob_matrices(PIDX, midx, blens)
        ref.update_partials([o.as_tuple() for o in ops])
        mine.update_partials(ops)

        ref_logl = ref.edge_loglikelihood(
            root.clv_index, root.scaler_index, root.back.clv_index,
            root.back.scaler_index, root.pmatrix_index, PIDX)
        my_logl = mine.compute_edge_loglikelihood(
            root.clv_index, root.scaler_index, root.back.clv_index,
            root.back.scaler_index, root.pmatrix_index, PIDX)
        np.testing.assert_allclose(my_logl, ref_logl, rtol=1e-9,
                                   err_msg=f"{asc} base logL")

        ref_sum = ref.sumtable(root.clv_index, root.back.clv_index,
                               root.scaler_index, root.back.scaler_index,
                               PIDX)
        my_sum = mine.update_sumtable(root.clv_index, root.back.clv_index,
                                      root.scaler_index,
                                      root.back.scaler_index, PIDX)

        pm = int(root.pmatrix_index)
        for t in TEST_BRANCH_LENGTHS:
            rd1, rd2 = ref.likelihood_derivatives(
                root.scaler_index, root.back.scaler_index, t, PIDX, ref_sum)
            md1, md2 = mine.compute_likelihood_derivatives(
                root.scaler_index, root.back.scaler_index, t, PIDX, my_sum)
            np.testing.assert_allclose(
                (md1, md2), (rd1, rd2), rtol=1e-7, atol=1e-9,
                err_msg=f"{asc} derivs t={t}")

            # asc-bias.c:143-156: re-evaluate the edge at the grid length
            ref.update_prob_matrices(PIDX, [pm], [t])
            mine.update_prob_matrices(PIDX, [pm], [t])
            ref_l = ref.edge_loglikelihood(
                root.clv_index, root.scaler_index, root.back.clv_index,
                root.back.scaler_index, pm, PIDX)
            my_l = mine.compute_edge_loglikelihood(
                root.clv_index, root.scaler_index, root.back.clv_index,
                root.back.scaler_index, pm, PIDX)
            np.testing.assert_allclose(my_l, ref_l, rtol=1e-9,
                                       err_msg=f"{asc} upbl logL t={t}")
        # restore the sweep length for the next rooting
        ref.update_prob_matrices(PIDX, [pm], [blens[list(midx).index(pm)]])
        mine.update_prob_matrices(PIDX, [pm], [blens[list(midx).index(pm)]])


def test_asc_bias_deep_pinv_rejected():
    """asc-bias.c:240-245: P-inv under asc-bias must fail on both sides."""
    ref, mine, _ = _asc_partitions(sites=8)
    ref.set_asc_bias_type(ASC_ATTR["lewis"])
    mine.set_asc_bias_type(pll.ASC_LEWIS)
    lib = oracle.get_lib()
    assert lib.pll_update_invariant_sites_proportion(ref.ptr, 0, 0.5) == 0
    with pytest.raises(pll.PllError):
        mine.update_invariant_sites_proportion(0, 0.5)
