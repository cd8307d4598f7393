"""Log-likelihood evaluation at a root CLV or across an edge.

Capability parity with `pll_core_root_loglikelihood` /
`pll_core_edge_loglikelihood_ii` (libpll `src/core_likelihood.c:24-210,
727-1002`) and the ascertainment-bias correction paths of
`src/likelihood.c:24-119,170-247,321-414`, redesigned as vectorized
reductions over the ``[C, S, L]`` CLV layout with sites on the lane axis.

Scaling fold-back:
  * per-site scalers enter additively: ``site_lnl += scaler · log(2**-256)``;
  * per-rate scalers are folded exactly like the reference
    (`core_likelihood.c:896-941`): the per-site common part is the minimum
    over rates, the per-rate remainder is capped at SCALE_RATE_MAXDIFF and
    applied multiplicatively as ``2**(-256·diff)`` to the per-rate term
    *before* rate mixing. (The reference's generic *root* kernel predates
    per-rate scalers and misreads the scaler layout in that mode; we apply
    the edge-kernel fold at the root as well.)

Ascertainment-bias corrections operate on the ``S`` extra all-one-state
columns appended to the site axis (invariant "pseudo-sites"), with the three
reference flavors: Lewis (-Σw·log(1-L₀)), Felsenstein (+Σw_inv·log(L₀)), and
Stamatakis (add the weighted per-state log-likelihoods directly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.constants import SCALE_RATE_MAXDIFF, scale_shift_bits

# asc-bias modes (host-level enum; ASC_NONE must be falsy)
ASC_NONE = 0
ASC_LEWIS = 1
ASC_FELSENSTEIN = 2
ASC_STAMATAKIS = 3

def _log_scale_threshold(dtype):
    # log(2**-shift) in the working dtype (shift: 256 for f64, 64 for f32)
    shift = scale_shift_bits(dtype)
    return jnp.asarray(-float(shift), dtype) * jnp.log(jnp.asarray(2.0, dtype))


def scale_pow(scal, dtype):
    """Exact 2**(-shift·scal) for integer scaler counts.

    Uses ldexp so results match C ``pow(2**-256, n)`` bit-for-bit in f64,
    including gradual underflow to subnormals and zero (jnp.power mis-handles
    tiny bases on some backends).
    """
    shift = scale_shift_bits(dtype)
    return jnp.ldexp(jnp.ones(scal.shape, dtype), -shift * scal)


def _fold_rate_scalers(scalers):
    """min/cap fold of per-rate scalers [C, L] -> (site [L], capped diff [C, L]).

    Reference: core_likelihood.c:916-931.
    """
    site = jnp.min(scalers, axis=0)
    diff = jnp.minimum(scalers - site[None, :], SCALE_RATE_MAXDIFF)
    return site, diff


def _apply_rate_fold(term_r, diff, dtype):
    """Multiply per-rate site terms by 2**(-256·diff) (capped)."""
    return term_r * scale_pow(diff, dtype)


def _mix_rates(term_r, freqs_pc, rate_weights, prop_invar, invariant):
    """Rate mixing with invariant-site handling.

    term_r: [C, L] per-rate site likelihoods.
    invariant: int32 [L]; -1 for variant sites, else the invariant state.
    Returns term [L] = Σ_c w_c · ((1-p)·term_r + p·π[inv])   (per-cat p).
    """
    has_inv = invariant >= 0  # [L]
    inv_idx = jnp.maximum(invariant, 0)
    inv_lk = jnp.where(has_inv[None, :], freqs_pc[:, inv_idx], 0.0)  # [C, L]
    pinv = prop_invar[:, None]  # [C, 1]
    mixed = jnp.where(pinv > 0.0,
                      term_r * (1.0 - pinv) + inv_lk * pinv,
                      term_r)
    return jnp.einsum("c,cn->n", rate_weights, mixed)


def _site_lnl(term, site_scalers, pattern_weights, dtype):
    return (jnp.log(term) + site_scalers.astype(dtype)
            * _log_scale_threshold(dtype)) * pattern_weights


@partial(jax.jit, static_argnames=("sites", "per_rate", "asc_mode"))
def root_loglikelihood(clv_root, scaler, freqs_pc, rate_weights,
                       pattern_weights, prop_invar, invariant,
                       sites, per_rate=False, asc_mode=ASC_NONE):
    """Root log-likelihood (+ per-site vector).

    Args:
      clv_root: [C, S, L] with L = sites (+ S asc columns if asc_mode).
      scaler: [L] or [C, L] int32 (zeros when the root has no scale buffer).
      freqs_pc: [C, S] per-category frequencies (params_indices resolved).
      rate_weights: [C]. pattern_weights: [L] in the working dtype.
      prop_invar: [C]. invariant: int32 [L].
      sites: static number of real sites.

    Returns:
      (logl scalar, per-site log-likelihood [sites]).
    """
    dtype = clv_root.dtype
    term_r = jnp.einsum("csn,cs->cn", clv_root, freqs_pc)  # [C, L]

    if per_rate:
        site_scal, diff = _fold_rate_scalers(scaler)
        term_r = _apply_rate_fold(term_r, diff, dtype)
    else:
        site_scal = scaler

    term = _mix_rates(term_r, freqs_pc, rate_weights, prop_invar, invariant)
    persite = _site_lnl(term[:sites], site_scal[:sites],
                        pattern_weights[:sites], dtype)
    logl = jnp.sum(persite)

    if asc_mode:
        logl += _asc_correction(term_r, site_scal, rate_weights,
                                pattern_weights, sites, asc_mode, dtype)
    return logl, persite


@partial(jax.jit, static_argnames=("sites", "per_rate", "asc_mode"))
def edge_loglikelihood(clv_parent, clv_child, scaler_parent, scaler_child,
                       pmatrix, freqs_pc, rate_weights, pattern_weights,
                       prop_invar, invariant, sites, per_rate=False,
                       asc_mode=ASC_NONE):
    """Edge log-likelihood between two inner CLVs (reference "ii" kernel;
    tips are bit-encoded CLVs so the "ti"/"tt" cases reduce to this one).

    pmatrix: [C, S, S] for the connecting branch.
    Other arguments as in :func:`root_loglikelihood`.
    """
    dtype = clv_parent.dtype
    # termb[c,j,n] = Σ_k P[c,j,k]·clv_child[c,k,n]
    termb = jnp.einsum("cjk,ckn->cjn", pmatrix, clv_child,
                       preferred_element_type=dtype)
    term_r = jnp.einsum("cjn,cj,cjn->cn", clv_parent, freqs_pc, termb)

    if per_rate:
        combined = scaler_parent + scaler_child  # [C, L]
        site_scal, diff = _fold_rate_scalers(combined)
        term_r = _apply_rate_fold(term_r, diff, dtype)
    else:
        site_scal = scaler_parent + scaler_child  # [L]

    term = _mix_rates(term_r, freqs_pc, rate_weights, prop_invar, invariant)
    persite = _site_lnl(term[:sites], site_scal[:sites],
                        pattern_weights[:sites], dtype)
    logl = jnp.sum(persite)

    if asc_mode:
        logl += _asc_correction(term_r, site_scal, rate_weights,
                                pattern_weights, sites, asc_mode, dtype)
    return logl, persite


def asc_correction_terms(term_r_asc, scal_asc, rate_weights, asc_weights,
                         sum_w_real, asc_mode, dtype):
    """Ascertainment-bias correction from already-evaluated pseudo-site
    terms: ``term_r_asc`` [C, S] per-rate likelihoods of the S all-one-state
    columns (per-rate scalers already folded), ``scal_asc`` [S] their site
    scaler counts, ``asc_weights`` [S] the per-state weights, ``sum_w_real``
    the total real-site pattern weight.  No invariant-site mixing applies on
    these columns (reference likelihood.c:24-119, 170-247, 321-414)."""
    t = jnp.einsum("c,cn->n", rate_weights, term_r_asc)  # [S]
    scal = scal_asc.astype(dtype)

    if asc_mode == ASC_STAMATAKIS:
        # weighted log-likelihood of each pseudo-site; the scaler fold-back is
        # deliberately NOT weighted, matching likelihood.c:96-101
        return jnp.sum(jnp.log(t) * asc_weights
                       + scal * _log_scale_threshold(dtype))
    # Lewis / Felsenstein need the absolute likelihoods
    l_base = jnp.sum(t * scale_pow(scal_asc, dtype))
    if asc_mode == ASC_LEWIS:
        return -(sum_w_real * jnp.log(1.0 - l_base))
    # ASC_FELSENSTEIN
    return jnp.sum(asc_weights) * jnp.log(l_base)


def _asc_correction(term_r, site_scal, rate_weights, pattern_weights,
                    sites, asc_mode, dtype):
    """Asc correction from the S extra "pseudo-site" columns riding the
    site axis (everything beyond ``sites``)."""
    return asc_correction_terms(
        term_r[:, sites:], site_scal[sites:], rate_weights,
        pattern_weights[sites:], jnp.sum(pattern_weights[:sites]),
        asc_mode, dtype)
