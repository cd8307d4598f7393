"""Analytic first/second branch-length derivatives of the log-likelihood.

Capability parity with `pll_core_update_sumtable_ii` /
`pll_core_likelihood_derivatives` (libpll `src/core_derivatives.c:125-269,
448-732`). The two-phase split is preserved because it is the right
factorization on any hardware:

  phase 1 (``sumtable``, branch-length independent, expensive):
      ``sum[n,c,j] = (Σ_k clvp[c,k,n]·π_k·left[k,j]) · (Σ_k right[j,k]·clvc[c,k,n])``
      — two batched matmuls into the eigenbasis, computed once per edge;

  phase 2 (cheap, re-run per Newton iteration):
      ``diag[c,j] = {e^{λ_j k_c t}, λ_j k_c e^{...}, (λ_j k_c)² e^{...}}``
      with ``k_c = r_c/(1-p_inv)``; per site the dot of sumtable and diag
      gives (L, L', L''), then ``d(-lnL) = -L'/L`` and
      ``dd = (L'/L)² - L''/L`` accumulate with pattern weights.

Analytic forms (not ``jax.grad``) are required for parity: the reference's
invariant-site and ascertainment-bias derivative corrections must match
term-for-term (see PAPERS.md, "AD is no panacea for phylogenetic gradients").

Scaling: per-site scalers cancel in the ratios L'/L and need no handling
except in the asc-bias part, which uses absolute likelihoods; per-rate
scalers are folded (min/cap, 2**(-256·diff)) INTO the sumtable, exactly as
`core_derivatives.c:224-242`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .likelihood import (ASC_FELSENSTEIN, ASC_LEWIS, ASC_NONE, ASC_STAMATAKIS,
                         _fold_rate_scalers, scale_pow)


@partial(jax.jit, static_argnames=("per_rate",))
def update_sumtable(clv_parent, clv_child, scaler_parent, scaler_child,
                    freqs_pc, left_pc, right_pc, per_rate=False):
    """Phase-1 sumtable for an edge.

    Args:
      clv_parent, clv_child: [C, S, L].
      scaler_parent, scaler_child: [C, L] int32 (only used when per_rate;
        pass zeros when a node has no scale buffer).
      freqs_pc: [C, S]; left_pc: [C, S, S]; right_pc: [C, S, S]
        (per-category-resolved eigen factors).

    Returns:
      sumtable [C, S, L] (state axis = eigenbasis index j).
    """
    dtype = clv_parent.dtype
    # lefterm[c,j,n] = Σ_k clvp[c,k,n]·π_k·left[c,k,j]
    lefterm = jnp.einsum("ckn,ck,ckj->cjn", clv_parent, freqs_pc, left_pc,
                         preferred_element_type=dtype)
    # righterm[c,j,n] = Σ_k right[c,j,k]·clvc[c,k,n]
    righterm = jnp.einsum("cjk,ckn->cjn", right_pc, clv_child,
                          preferred_element_type=dtype)
    sumtable = lefterm * righterm

    if per_rate:
        combined = scaler_parent + scaler_child  # [C, L]
        _, diff = _fold_rate_scalers(combined)
        sumtable = sumtable * scale_pow(diff, dtype)[:, None, :]
    return sumtable


@partial(jax.jit, static_argnames=("sites", "asc_mode"))
def likelihood_derivatives(sumtable, branch_length, rates, prop_invar,
                           eigenvals_pc, freqs_pc, rate_weights, invariant,
                           pattern_weights, scaler_parent, scaler_child,
                           sites, asc_mode=ASC_NONE):
    """Phase-2: (d(-lnL)/dt, d²(-lnL)/dt²) at ``branch_length``.

    Args:
      sumtable: [C, S, L] from :func:`update_sumtable`.
      rates: [C]; prop_invar: [C]; eigenvals_pc: [C, S]; freqs_pc: [C, S].
      invariant: int32 [L]; pattern_weights: [L] (working dtype).
      scaler_parent/scaler_child: [L] int32 per-site scalers (zeros if
        absent) — used only by the asc-bias part.
      sites: static number of real sites.

    Returns:
      (d1, d2) scalars.
    """
    dtype = sumtable.dtype
    ki = rates / (1.0 - prop_invar)  # [C]
    lam = eigenvals_pc * ki[:, None]  # [C, S]
    e = jnp.exp(lam * branch_length)  # [C, S]
    diag0, diag1, diag2 = e, lam * e, lam * lam * e

    # cat_lk[d, c, n] = Σ_j sum[c,j,n]·diag_d[c,j]
    cat0 = jnp.einsum("cjn,cj->cn", sumtable, diag0)
    cat1 = jnp.einsum("cjn,cj->cn", sumtable, diag1)
    cat2 = jnp.einsum("cjn,cj->cn", sumtable, diag2)

    def site_lk(cat0, cat1, cat2, invariant):
        # invariant mixing per category (core_derivatives.c:481-491)
        pinv = prop_invar[:, None]
        has_inv = invariant >= 0
        inv_idx = jnp.maximum(invariant, 0)
        inv_lk = jnp.where(has_inv[None, :],
                           freqs_pc[:, inv_idx] * pinv, 0.0)
        c0 = jnp.where(pinv > 0, cat0 * (1.0 - pinv) + inv_lk, cat0)
        c1 = jnp.where(pinv > 0, cat1 * (1.0 - pinv), cat1)
        c2 = jnp.where(pinv > 0, cat2 * (1.0 - pinv), cat2)
        lk0 = jnp.einsum("c,cn->n", rate_weights, c0)
        lk1 = jnp.einsum("c,cn->n", rate_weights, c1)
        lk2 = jnp.einsum("c,cn->n", rate_weights, c2)
        return lk0, lk1, lk2

    # Stamatakis correction evaluates the extra pseudo-sites exactly like
    # real sites (core_derivatives.c:536-545); otherwise only [:sites].
    ef = sites + (sumtable.shape[1] if asc_mode == ASC_STAMATAKIS else 0)
    lk0, lk1, lk2 = site_lk(cat0[:, :ef], cat1[:, :ef], cat2[:, :ef],
                            invariant[:ef])
    deriv1 = -lk1 / lk0
    deriv2 = deriv1 * deriv1 - lk2 / lk0
    w = pattern_weights[:ef]
    d1 = jnp.sum(w * deriv1)
    d2 = jnp.sum(w * deriv2)

    if asc_mode in (ASC_LEWIS, ASC_FELSENSTEIN):
        # pseudo-site (L, L', L'') with absolute scaling, no invariant mixing
        def asc_site_lk(cat0, cat1, cat2):
            lk0 = jnp.einsum("c,cn->n", rate_weights, cat0)
            lk1 = jnp.einsum("c,cn->n", rate_weights, cat1)
            lk2 = jnp.einsum("c,cn->n", rate_weights, cat2)
            return lk0, lk1, lk2

        # NOTE: prop_invar is disallowed with asc bias (models.c:402-414), so
        # skipping the invariant mixing here matches the reference's NULL
        # invariant pointer (core_derivatives.c:669-680).
        a0, a1, a2 = asc_site_lk(cat0[:, sites:], cat1[:, sites:],
                                 cat2[:, sites:])
        factor = scale_pow(scaler_parent[sites:] + scaler_child[sites:],
                           dtype)
        A0 = jnp.sum(a0 * factor)
        A1 = jnp.sum(a1 * factor)
        A2 = jnp.sum(a2 * factor)
        sum_w = jnp.sum(pattern_weights[:sites])
        sum_w_inv = jnp.sum(pattern_weights[sites:])
        if asc_mode == ASC_LEWIS:
            d1 = d1 + sum_w * (A1 / (A0 - 1.0))
            d2 = d2 + sum_w * (((A0 - 1.0) * A2 - A1 * A1)
                               / ((A0 - 1.0) * (A0 - 1.0)))
        else:  # Felsenstein
            d1 = d1 - sum_w_inv * (A1 / A0)
            d2 = d2 - sum_w_inv * ((A2 * A0 - A1 * A1) / (A0 * A0))
    return d1, d2
