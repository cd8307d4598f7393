"""Transition-probability matrix kernel: P(t) = expm(Q·t·r/(1−p_inv)).

Capability parity with `pll_core_update_pmatrix` (libpll
`src/core_pmatrix.c:24-250`), redesigned as one batched XLA computation over
(branch × rate-category) instead of the reference's nested scalar loops:

  * the eigenvalue exponentials use ``expm1`` and the identity is added back
    at the end — the numerically robust form for Qt → 0 (reference cites
    issue #129); it also makes ``t == 0`` produce an exact identity matrix
    with no special-casing;
  * per-rate-category parameter indirection (``params_indices``) supports
    LG4M/LG4X mixtures and per-branch matrices for heterotachy
    (reference `src/models.c:333-364`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.constants import MISC_EPSILON


@partial(jax.jit, static_argnames=("dtype",))
def compute_pmatrices(branch_lengths, rates, prop_invar, params_indices,
                      eigenvals, left, right, dtype=None):
    """Batched P-matrix computation.

    Args:
      branch_lengths: [B] branch lengths.
      rates: [C] rate-category multipliers.
      prop_invar: [M] per-rate-matrix proportion of invariant sites.
      params_indices: [C] int32, rate-matrix index used by each category.
      eigenvals: [M, S].
      left: [M, S, S]  (diag(√π)⁻¹ V).
      right: [M, S, S] (Vᵀ diag(√π)).
      dtype: output dtype (defaults to eigenvals.dtype).

    Returns:
      pmatrix [B, C, S, S].
    """
    dtype = dtype or eigenvals.dtype
    ev = eigenvals[params_indices]  # [C, S]
    lf = left[params_indices]  # [C, S, S]
    rt = right[params_indices]  # [C, S, S]
    pinv = prop_invar[params_indices]  # [C]

    # effective rate r/(1 - p_inv); p_inv below epsilon counts as zero
    # (reference core_pmatrix.c:189-199)
    denom = jnp.where(pinv > MISC_EPSILON, 1.0 - pinv, 1.0)
    ki = rates / denom  # [C]

    # expm1(λ · k · t): [B, C, S]
    expd = jnp.expm1(ev[None, :, :] * (ki[None, :, None] *
                                       branch_lengths[:, None, None]))

    # P = left @ diag(expd) @ right + I ; expm1 of zero gives exactly I.
    pmat = jnp.einsum("cij,bcj,cjk->bcik", lf, expd, rt,
                      preferred_element_type=dtype)
    eye = jnp.eye(ev.shape[-1], dtype=dtype)
    return (pmat + eye).astype(dtype)
