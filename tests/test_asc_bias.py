"""Ascertainment-bias correction parity (Lewis / Felsenstein / Stamatakis).

Mirrors the reference asc-bias test (test/src/asc-bias.c): likelihoods and
derivatives on partitions created with asc-bias allocation, including scaled
configurations.
"""

import numpy as np
import pytest

import oracle

if not oracle.available():
    pytest.skip("reference oracle unavailable", allow_module_level=True)

import libpll_tpu as pll
from libpll_tpu.io import maps
from libpll_tpu.models.gamma import compute_gamma_cats

RNG = np.random.default_rng(11)

ASC_ATTR = {
    "lewis": (1 << 5) | (1 << 8),
    "felsenstein": (2 << 5) | (1 << 8),
    "stamatakis": (3 << 5) | (1 << 8),
}
ASC_MODE = {
    "lewis": pll.ASC_LEWIS,
    "felsenstein": pll.ASC_FELSENSTEIN,
    "stamatakis": pll.ASC_STAMATAKIS,
}


def _setup(asc, rate_cats=4, sites=40, states=4, state_weights=None):
    n = states * (states - 1) // 2
    params = RNG.uniform(0.2, 3.0, n)
    freqs = RNG.uniform(0.1, 1.0, states)
    freqs /= freqs.sum()
    blens = RNG.uniform(0.05, 1.0, 8)
    seqs = ["".join(RNG.choice(list("ACGT"), sites)) for _ in range(5)]
    rates = compute_gamma_cats(1.2, rate_cats) if rate_cats > 1 \
        else np.ones(1)

    ref = oracle.RefPartition(5, 4, states, sites, 1, 8, rate_cats, 4,
                              attributes=ASC_ATTR[asc])
    mine = pll.Partition(5, 4, states, sites, 1, 8, rate_cats, 4,
                         asc_bias_alloc=True)
    mine.set_asc_bias_type(ASC_MODE[asc])
    for part in (ref, mine):
        part.set_frequencies(0, freqs)
        part.set_subst_params(0, params)
        part.set_category_rates(rates)
    for i, s in enumerate(seqs):
        ref.set_tip_states(i, maps.pll_map_nt, s)
        mine.set_tip_states(i, maps.pll_map_nt, s)
    if state_weights is not None:
        w = np.asarray(state_weights, dtype=np.uint32)
        ref.set_asc_state_weights(w)
        mine.set_asc_state_weights(w)
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


@pytest.mark.parametrize("asc", ["lewis", "felsenstein", "stamatakis"])
@pytest.mark.parametrize("rate_cats", [1, 4])
def test_asc_bias_loglikelihood(asc, rate_cats):
    # Stamatakis/Felsenstein need per-state weights (their corrections weight
    # the pseudo-sites); Lewis works with zero weights too but set them for
    # all to exercise the same path as the reference test
    ref, mine, pidx = _setup(asc, rate_cats, state_weights=[5, 3, 2, 4])

    ref_root = ref.root_loglikelihood(8, 3, pidx)
    my_root = mine.compute_root_loglikelihood(8, 3, pidx)
    np.testing.assert_allclose(my_root, ref_root, rtol=1e-10,
                               err_msg="root logl")

    ref_edge = ref.edge_loglikelihood(8, 3, 7, 2, 6, pidx)
    my_edge = mine.compute_edge_loglikelihood(8, 3, 7, 2, 6, pidx)
    np.testing.assert_allclose(my_edge, ref_edge, rtol=1e-10,
                               err_msg="edge logl")


@pytest.mark.parametrize("asc", ["lewis", "felsenstein", "stamatakis"])
def test_asc_bias_derivatives(asc):
    ref, mine, pidx = _setup(asc, 4, state_weights=[1, 1, 1, 1])
    ref_sum = ref.sumtable(7, 8, 2, 3, pidx)
    my_sum = mine.update_sumtable(7, 8, 2, 3, pidx)
    for t in [0.1, 0.5, 1.0, 5.0, 30.0]:
        rd1, rd2 = ref.likelihood_derivatives(2, 3, t, pidx, ref_sum)
        md1, md2 = mine.compute_likelihood_derivatives(2, 3, t, pidx, my_sum)
        np.testing.assert_allclose((md1, md2), (rd1, rd2), rtol=1e-8,
                                   atol=1e-10, err_msg=f"{asc} t={t}")


def test_asc_bias_requires_alloc():
    part = pll.Partition(5, 4, 4, 10, 1, 8, 1, 4)
    with pytest.raises(pll.PllError):
        part.set_asc_bias_type(pll.ASC_LEWIS)


def test_asc_bias_incompatible_with_pinv():
    part = pll.Partition(5, 4, 4, 40, 1, 8, 1, 4, asc_bias_alloc=True)
    part.set_asc_bias_type(pll.ASC_LEWIS)
    seqs = ["ACGT" * 10] * 5
    for i, s in enumerate(seqs):
        part.set_tip_states(i, maps.pll_map_nt, s)
    with pytest.raises(pll.PllError):
        part.update_invariant_sites_proportion(0, 0.3)
