"""Model-parameter optimization (engine/modelopt.py): the differentiable
scorer must agree with the step-by-step Partition path, its gradients with
finite differences, and the optimizer must recover simulation parameters
(GTR exchangeabilities, frequencies, Γ shape, p-inv) on data with signal.

The reference has no model-opt entry point (users assemble it from
pll_set_subst_params/pll_set_frequencies/pll_compute_gamma_cats plus an
external optimizer); correctness here is anchored to the same likelihood
the parity suite pins, plus parameter recovery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import libpll_tpu as pll
from libpll_tpu.engine import modelopt
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.models.gtr import eigen_decompose
from libpll_tpu.tree import utree as ut

TRUE_PARAMS = np.array([0.9, 3.1, 0.6, 1.4, 3.6, 1.0])
TRUE_FREQS = np.array([0.32, 0.18, 0.24, 0.26])


def _random_tree(tips, rng):
    items = [f"t{i}:{rng.uniform(0.08, 0.35):.4f}" for i in range(tips)]
    while len(items) > 3:
        i, j = sorted(rng.choice(len(items), 2, replace=False))
        b = items.pop(j)
        a = items.pop(i)
        items.append(f"({a},{b}):{rng.uniform(0.08, 0.35):.4f}")
    return f"({items[0]},{items[1]},{items[2]});"


def _simulate(newick, sites, rng, *, params=TRUE_PARAMS, freqs=TRUE_FREQS,
              site_rates=None):
    """Evolve sequences under GTR along the tree; ``site_rates`` (length
    ``sites``) scales each site's branch lengths (Γ / invariant signal)."""
    tree = ut.parse_newick_string(newick)
    w, left, right = eigen_decompose(params, freqs)
    r = np.ones(sites) if site_rates is None else np.asarray(site_rates)

    def pmats(t):
        # [sites, 4, 4] site-specific transition matrices
        e = np.expm1(w[None, :] * (t * r)[:, None])
        return np.einsum("ij,sj,jk->sik", left, e, right) + np.eye(4)

    seqs = {}

    def descend(node, state):
        if node.is_tip:
            seqs[node.label] = state
            return
        for m in list(node.ring())[1:]:
            child = m.back
            P = pmats(max(child.length, 1e-6))
            u = rng.random(sites)
            cdf = np.cumsum(P[np.arange(sites), state], axis=1)
            cdf /= cdf[:, -1:]
            nxt = (u[:, None] > cdf).sum(axis=1)
            descend(child, nxt)

    root = tree.root
    base = rng.choice(4, sites, p=freqs / freqs.sum())
    for m in root.ring():
        child = m.back
        P = pmats(max(child.length, 1e-6))
        u = rng.random(sites)
        cdf = np.cumsum(P[np.arange(sites), base], axis=1)
        cdf /= cdf[:, -1:]
        descend(child, (u[:, None] > cdf).sum(axis=1))
    alpha = "ACGT"
    return {lab: "".join(alpha[s] for s in st) for lab, st in seqs.items()}


def _partition_for(tree, seqs, sites, cats=1, params=None, freqs=None,
                   rates=None):
    tips = tree.tip_count
    part = pll.Partition(tips, tips - 2, 4, sites, 1, 2 * tips - 3, cats,
                         tips - 2)
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    for lab, s in seqs.items():
        part.set_tip_states(order[lab], pll.maps.pll_map_nt, s)
    part.set_subst_params(0, params if params is not None
                          else [1.0] * 6)
    part.set_frequencies(0, freqs if freqs is not None else [0.25] * 4)
    if rates is not None:
        part.set_category_rates(rates)
    return part


def _step_by_step_logl(tree, part, cats):
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * cats, midx, blens)
    part.update_partials(ops)
    r = tree.root
    return part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, [0] * cats)


def test_param_score_matches_partition():
    """The differentiable scorer equals the parity-tested Partition path
    at the same parameter point (4 Γ categories, nonuniform everything)."""
    rng = np.random.default_rng(3)
    newick = _random_tree(8, rng)
    sites, cats = 120, 4
    seqs = _simulate(newick, sites, rng)
    tree = ut.parse_newick_string(newick)
    rates = compute_gamma_cats(0.7, cats)
    part = _partition_for(tree, seqs, sites, cats, TRUE_PARAMS, TRUE_FREQS,
                          rates)
    want = _step_by_step_logl(tree, part, cats)

    score, _bl = modelopt.make_param_score(part, tree)
    got = float(score(
        jnp.log(jnp.asarray(TRUE_PARAMS[:-1])),
        jnp.log(jnp.asarray(TRUE_FREQS)),
        jnp.asarray(rates), jnp.full(cats, 1.0 / cats),
        jnp.asarray(0.0), jnp.asarray(_bl)))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_gradients_match_finite_differences():
    rng = np.random.default_rng(5)
    newick = _random_tree(6, rng)
    sites, cats = 80, 2
    seqs = _simulate(newick, sites, rng)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs, sites, cats)
    score, bl = modelopt.make_param_score(part, tree)
    rates = jnp.asarray(compute_gamma_cats(1.0, cats))
    rw = jnp.full(cats, 1.0 / cats)
    pv = jnp.asarray(0.0)
    bl = jnp.asarray(bl)

    ls0 = jnp.log(jnp.asarray(TRUE_PARAMS[:-1] * 1.07))
    fl0 = jnp.log(jnp.asarray(TRUE_FREQS))

    f = lambda ls, fl: score(ls, fl, rates, rw, pv, bl)  # noqa: E731
    g_ls, g_fl = jax.grad(f, argnums=(0, 1))(ls0, fl0)

    eps = 1e-6
    for k in range(ls0.shape[0]):
        e = jnp.zeros_like(ls0).at[k].set(eps)
        fd = (f(ls0 + e, fl0) - f(ls0 - e, fl0)) / (2 * eps)
        np.testing.assert_allclose(g_ls[k], fd, rtol=2e-5, atol=1e-7)
    for k in range(fl0.shape[0]):
        e = jnp.zeros_like(fl0).at[k].set(eps)
        fd = (f(ls0, fl0 + e) - f(ls0, fl0 - e)) / (2 * eps)
        np.testing.assert_allclose(g_fl[k], fd, rtol=2e-5, atol=1e-7)


def test_optimizer_recovers_gtr_parameters():
    """From a (jittered) uniform start on 4000 simulated sites, L-BFGS must
    land near the generating exchangeabilities and frequencies."""
    rng = np.random.default_rng(11)
    newick = _random_tree(8, rng)
    sites = 4000
    seqs = _simulate(newick, sites, rng)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs, sites)

    res = modelopt.optimize_model(part, tree, opt_alpha=False,
                                  rate_mode="fixed", rounds=2)
    assert res.trajectory[-1] >= res.trajectory[0]
    assert res.logl > res.trajectory[0] + 50.0  # real signal, real gain
    # parameter recovery (last pinned to 1, like the truth)
    np.testing.assert_allclose(res.subst_params, TRUE_PARAMS, rtol=0.30)
    np.testing.assert_allclose(res.frequencies, TRUE_FREQS, atol=0.03)
    # written back through the setters
    np.testing.assert_allclose(part.subst_params[0], res.subst_params)
    assert not part.eigen_valid[0]

    # the optimum is a stationary point and beats the truth-parameter logL
    part_t = _partition_for(tree, seqs, sites, 1, TRUE_PARAMS, TRUE_FREQS)
    logl_truth = _step_by_step_logl(tree, part_t, 1)
    assert res.logl >= logl_truth - 1e-6


def test_optimizer_recovers_alpha():
    """Sites simulated with Γ(0.5)-discretized rate multipliers; the Brent
    pass must move alpha from 1.0 toward 0.5 and improve the logL."""
    rng = np.random.default_rng(17)
    newick = _random_tree(8, rng)
    sites, cats = 3000, 4
    true_rates = compute_gamma_cats(0.5, cats)
    site_rates = true_rates[rng.integers(0, cats, sites)]
    seqs = _simulate(newick, sites, rng, site_rates=site_rates)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs, sites, cats,
                          TRUE_PARAMS, TRUE_FREQS,
                          compute_gamma_cats(1.0, cats))

    res = modelopt.optimize_model(part, tree, opt_subst=False,
                                  opt_freqs=False, opt_alpha=True,
                                  alpha=1.0, rounds=1)
    assert res.logl > res.trajectory[0]
    assert 0.3 < res.alpha < 0.85, res.alpha
    np.testing.assert_allclose(part.rates,
                               compute_gamma_cats(res.alpha, cats))


def test_optimizer_recovers_pinv():
    """30% of sites held invariant; the p-inv Brent pass must find a
    proportion near 0.3 (single category keeps Γ out of the way)."""
    rng = np.random.default_rng(23)
    newick = _random_tree(8, rng)
    sites = 3000
    site_rates = (rng.random(sites) > 0.30).astype(float)
    seqs = _simulate(newick, sites, rng, site_rates=site_rates)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs, sites, 1, TRUE_PARAMS, TRUE_FREQS)

    res = modelopt.optimize_model(part, tree, opt_subst=False,
                                  opt_freqs=False, opt_alpha=False,
                                  opt_pinv=True, rounds=1)
    assert res.logl > res.trajectory[0]
    assert 0.15 < res.prop_invar < 0.45, res.prop_invar
    assert part.prop_invar[0] == pytest.approx(res.prop_invar)


def test_free_rates_match_or_beat_gamma():
    """rate_mode='free' (direct category rates + weights) must reach at
    least the Γ optimum on Γ-simulated data, with the weighted mean rate
    pinned to 1 (the identifiability constraint Γ maintains)."""
    rng = np.random.default_rng(29)
    newick = _random_tree(8, rng)
    sites, cats = 2000, 4
    true_rates = compute_gamma_cats(0.6, cats)
    site_rates = true_rates[rng.integers(0, cats, sites)]
    seqs = _simulate(newick, sites, rng, site_rates=site_rates)
    tree = ut.parse_newick_string(newick)

    part_g = _partition_for(tree, seqs, sites, cats, TRUE_PARAMS,
                            TRUE_FREQS, compute_gamma_cats(1.0, cats))
    res_g = modelopt.optimize_model(part_g, tree, opt_subst=False,
                                    opt_freqs=False, opt_alpha=True,
                                    rounds=1)

    part_f = _partition_for(tree, seqs, sites, cats, TRUE_PARAMS,
                            TRUE_FREQS, compute_gamma_cats(1.0, cats))
    res_f = modelopt.optimize_model(part_f, tree, opt_subst=False,
                                    opt_freqs=False, rate_mode="free",
                                    rounds=2)
    assert res_f.logl >= res_g.logl - 0.5, (res_f.logl, res_g.logl)
    np.testing.assert_allclose(
        float((res_f.rate_weights * res_f.rates).sum()), 1.0, rtol=1e-6)


def test_oracle_agrees_with_optimized_parameters():
    """The compiled reference oracle, fed the optimized parameters through
    its own setters, must reproduce our reported optimum logL."""
    import oracle

    if not oracle.available():
        pytest.skip("reference oracle unavailable")
    rng = np.random.default_rng(31)
    newick = _random_tree(6, rng)
    sites, cats = 500, 4
    seqs = _simulate(newick, sites, rng)
    tree = ut.parse_newick_string(newick)
    part = _partition_for(tree, seqs, sites, cats, None, None,
                          compute_gamma_cats(1.0, cats))
    res = modelopt.optimize_model(part, tree, rounds=1)

    ref = oracle.RefPartition(6, 4, 4, sites, 1, 2 * 6 - 3, cats, 4)
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    nt = oracle.map_table("pll_map_nt")
    for lab, s in seqs.items():
        ref.set_tip_states(order[lab], nt, s)
    ref.set_subst_params(0, res.subst_params)
    ref.set_frequencies(0, res.frequencies)
    ref.set_category_rates(compute_gamma_cats(res.alpha, cats))
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    ref.update_prob_matrices([0] * cats, midx, blens)
    ref.update_partials([o.as_tuple() for o in ops])
    r = tree.root
    want = ref.edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index,
        r.back.scaler_index, r.pmatrix_index, [0] * cats)
    np.testing.assert_allclose(res.logl, want, atol=1e-6)


def test_infer_tree_with_model_optimization():
    """infer_tree(optimize_model=True) fits the model during inference:
    monotone trajectory, a ModelOptResult attached, and a final logL at
    least as good as the fixed-model run on the same data."""
    from libpll_tpu.search.infer import infer_tree

    rng = np.random.default_rng(37)
    newick = _random_tree(10, rng)
    sites, cats = 400, 4
    true_rates = compute_gamma_cats(0.5, cats)
    site_rates = true_rates[rng.integers(0, cats, sites)]
    seqs = _simulate(newick, sites, rng, site_rates=site_rates)

    kw = dict(rate_cats=cats, seed=5, radius=4, max_rounds=4)
    res_fixed = infer_tree(seqs, **kw)
    res_fit = infer_tree(seqs, optimize_model=True, model_rounds=1, **kw)

    assert res_fit.trajectory == sorted(res_fit.trajectory)
    assert res_fit.model is not None
    assert res_fit.logl > res_fixed.logl + 1.0, (res_fit.logl,
                                                 res_fixed.logl)
    assert "modelopt" in res_fit.timings
    # the partition carries the fitted parameters
    np.testing.assert_allclose(res_fit.partition.subst_params[0],
                               res_fit.model.subst_params)


# ---------------------------------------------------------------------------
# LG4-style mixtures: rate_matrices > 1 (reference examples/lg4/lg4.c)
# ---------------------------------------------------------------------------
_AA_ALPHA = "ARNDCQEGHILKMFPSTWYV"


def _simulate_lg4x(newick, sites, rng, weights, cat_rates):
    """Evolve protein sequences under the LG4X mixture: each site draws a
    category from ``weights``; category k evolves under rate matrix k at
    rate multiplier ``cat_rates[k]``."""
    from libpll_tpu.models.aa_tables import AA_MIXTURE_MODELS

    rates4, freqs4 = AA_MIXTURE_MODELS["lg4x"]
    tree = ut.parse_newick_string(newick)
    cat = rng.choice(len(weights), sites, p=np.asarray(weights))
    eig = [eigen_decompose(rates4[k], freqs4[k]) for k in range(4)]
    r = np.asarray(cat_rates)[cat]  # per-site rate multiplier

    def pmats(t):
        out = np.zeros((sites, 20, 20))
        for k, (w, left, right) in enumerate(eig):
            sel = cat == k
            if not sel.any():
                continue
            e = np.expm1(w[None, :] * (t * r[sel])[:, None])
            out[sel] = (np.einsum("ij,sj,jk->sik", left, e, right)
                        + np.eye(20))
        return out

    seqs = {}

    def step(P, state, u):
        cdf = np.cumsum(P[np.arange(sites), state], axis=1)
        cdf /= cdf[:, -1:]
        return (u[:, None] > cdf).sum(axis=1)

    def descend(node, state):
        if node.is_tip:
            seqs[node.label] = state
            return
        for m in list(node.ring())[1:]:
            child = m.back
            descend(child, step(pmats(max(child.length, 1e-6)), state,
                                rng.random(sites)))

    base = np.zeros(sites, np.int64)
    for k in range(4):
        sel = cat == k
        fk = np.asarray(freqs4[k], np.float64)
        base[sel] = rng.choice(20, int(sel.sum()), p=fk / fk.sum())
    for m in tree.root.ring():
        child = m.back
        descend(child, step(pmats(max(child.length, 1e-6)), base,
                            rng.random(sites)))
    return {lab: "".join(_AA_ALPHA[s] for s in st)
            for lab, st in seqs.items()}


def _lg4x_partition(tree, seqs, sites, rates, rweights):
    from libpll_tpu.models.aa_tables import AA_MIXTURE_MODELS

    rates4, freqs4 = AA_MIXTURE_MODELS["lg4x"]
    tips = tree.tip_count
    part = pll.Partition(tips, tips - 2, 20, sites, 4, 2 * tips - 3, 4,
                         tips - 2)
    order = {n.label: n.clv_index for n in ut.query_tipnodes(tree)}
    for lab, s in seqs.items():
        part.set_tip_states(order[lab], pll.maps.pll_map_aa, s)
    for k in range(4):
        part.set_subst_params(k, rates4[k])
        part.set_frequencies(k, freqs4[k])
    part.set_category_rates(rates)
    part.set_category_weights(rweights)
    return part


def test_param_score_matches_partition_lg4x():
    """Mixture scorer parity: the R=4 differentiable scorer equals the
    parity-tested step-by-step Partition path at the LG4X point."""
    from libpll_tpu.models.aa_tables import AA_MIXTURE_MODELS

    rates4, freqs4 = AA_MIXTURE_MODELS["lg4x"]
    rng = np.random.default_rng(41)
    newick = _random_tree(6, rng)
    sites, cats = 60, 4
    rates = compute_gamma_cats(0.8, cats)
    rweights = np.asarray([0.1, 0.2, 0.3, 0.4])
    seqs = _simulate_lg4x(newick, sites, rng, rweights, rates)
    tree = ut.parse_newick_string(newick)
    part = _lg4x_partition(tree, seqs, sites, rates, rweights)

    pidx = list(range(4))
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices(pidx, midx, blens)
    part.update_partials(ops)
    r = tree.root
    want = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, pidx)

    score, bl = modelopt.make_param_score(part, tree)
    rr = np.asarray(rates4, np.float64)
    got = float(score(
        jnp.log(jnp.asarray(rr[:, :-1] / rr[:, -1:])),
        jnp.log(jnp.asarray(np.asarray(freqs4, np.float64))),
        jnp.asarray(rates), jnp.asarray(rweights),
        jnp.asarray(0.0), jnp.asarray(bl)))
    # np.linalg.eigh (partition path) vs jnp.linalg.eigh (traced path)
    # differ at ~1e-13/entry on the 20-state empirical matrices
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_optimizer_recovers_lg4x_mixture_weights():
    """Free-rate fitting on LG4X-simulated data (the reference's
    lg4x_opt_weights_and_rates pattern, examples/lg4/lg4.c:295-370): the
    optimizer must recover the generating category weights over the four
    fixed empirical matrices and improve on the uniform start."""
    rng = np.random.default_rng(43)
    newick = _random_tree(8, rng)
    sites = 1500
    true_w = np.asarray([0.45, 0.30, 0.15, 0.10])
    true_r = np.asarray([0.3, 0.9, 1.6, 2.5])
    true_r = true_r / (true_w * true_r).sum()
    seqs = _simulate_lg4x(newick, sites, rng, true_w, true_r)
    tree = ut.parse_newick_string(newick)
    part = _lg4x_partition(tree, seqs, sites, np.ones(4),
                           np.full(4, 0.25))

    res = modelopt.optimize_model(part, tree, opt_subst=False,
                                  opt_freqs=False, opt_alpha=False,
                                  rate_mode="free", rounds=2)
    assert res.logl > res.trajectory[0] + 10.0
    # weight recovery: same ordering and a rough match
    assert np.argsort(res.rate_weights).tolist() == \
        np.argsort(true_w).tolist()
    np.testing.assert_allclose(res.rate_weights, true_w, atol=0.12)
    np.testing.assert_allclose(
        float((res.rate_weights * res.rates).sum()), 1.0, rtol=1e-6)
    # mixture parameters written back through the setters
    np.testing.assert_allclose(part.rate_weights, res.rate_weights)
    assert res.subst_params.shape == (4, 190)
