"""Full-tree Newton–Raphson branch-length optimization with CLV reuse.

The reference ships the per-branch pattern (`examples/newton/newton.c:31-100`:
one sumtable per branch, then a cheap Newton iteration on it); this module
packages the full pipeline over all 2n−3 edges:

  * edges are visited in pre-order, so consecutive evaluation roots are
    adjacent and the dirty-subtree machinery (tree/incremental.py)
    re-orients only O(1) CLVs per step on average — the reference's
    partial-traversal re-orientation trick (`examples/partial-traversal/
    partial.c:61-104`) driving the optimization loop;
  * the per-edge partial updates run through the one compiled
    schedule executor (``update_partials`` padded to a fixed capacity);
  * the Newton iteration itself is a single device-resident
    ``lax.while_loop`` over the branch-invariant sumtable (SURVEY §3.3) —
    recompiled once per partition envelope, reused for every edge and
    every sweep.

Branch lengths are clamped to [PLL_OPT_MIN_BL, PLL_OPT_MAX_BL]-style
bounds and a Newton step that would *decrease* the likelihood falls back
to keeping the old length (the classic safeguard; the reference example
leaves this to the caller)."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import derivatives as deriv_ops
from ..tree import incremental as inc
from ..tree import utree as ut

MIN_BL, MAX_BL = 1e-8, 100.0


@partial(jax.jit, static_argnames=("sites", "per_rate"))
def _newton_edge(sumtable, t0, rates, prop_invar_pc, evals_pc, freqs_pc,
                 rate_weights, invariant, pattern_weights, sp_site, sc_site,
                 sites, per_rate):
    """Device-resident Newton on one edge's sumtable -> (t*, d1_at_t*)."""
    dtype = sumtable.dtype

    def cond(carry):
        t, d1, it = carry
        return (jnp.abs(d1) > 1e-9) & (it < 32)

    def body(carry):
        t, _, it = carry
        d1, d2 = deriv_ops.likelihood_derivatives(
            sumtable, t, rates, prop_invar_pc, evals_pc, freqs_pc,
            rate_weights, invariant, pattern_weights, sp_site, sc_site,
            sites=sites, asc_mode=0)
        # |d2| keeps the step downhill for -lnL outside the convex basin
        # (d2 <= 0), where the raw Newton step walks uphill
        step = jnp.where(d2 != 0.0, d1 / jnp.abs(d2), d1)
        t_new = jnp.clip(t - step, MIN_BL, MAX_BL)
        return (t_new, d1, it + 1)

    big = jnp.asarray(jnp.inf, dtype)
    t_star, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, dtype), big, 0))
    return t_star


def _edge_logl(part, u, params_indices):
    return part.compute_edge_loglikelihood(
        u.clv_index, u.scaler_index, u.back.clv_index, u.back.scaler_index,
        u.pmatrix_index, params_indices)


def optimize_branch_lengths(tree, part, params_indices, *,
                            max_sweeps: int = 8, tol: float = 1e-6,
                            pad_to: Optional[int] = None
                            ) -> Tuple[float, int]:
    """Optimize every branch length in place; returns (final logL,
    sweeps used).  ``part`` must hold the model for ``tree`` (tips set,
    params set); CLVs are (re)computed here."""
    from ..utils.constants import SCALE_PER_RATE

    root = tree.root
    pidx = list(params_indices)
    per_rate = part.scale_mode == SCALE_PER_RATE
    cap = pad_to or max(8, 1 << (2 * tree.tip_count - 3).bit_length())

    # initial full evaluation + validity flags
    trav = ut.traverse(root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices(pidx, midx, blens)
    part.update_partials(ops)
    inc.mark_valid(trav)
    logl = _edge_logl(part, root, pidx)

    dtype = part.dtype
    zeros_site = jnp.zeros((part.sites_alloc,), jnp.int32)

    for sweep in range(max_sweeps):
        max_delta = 0.0
        seen = set()
        for node in ut.traverse(root, ut.TRAVERSE_PREORDER):
            if node.pmatrix_index in seen:
                continue
            seen.add(node.pmatrix_index)
            u = node if not node.is_tip else node.back
            if u.is_tip:
                continue  # 2-tip edge cannot occur in an unrooted tree

            # re-orient: recompute only the CLVs invalid for this rooting
            pops = inc.create_partial_operations(inc.partial_traverse(u))
            if pops:
                part.update_partials(pops, pad_to=cap)

            st = part.update_sumtable(u.clv_index, u.back.clv_index,
                                      u.scaler_index, u.back.scaler_index,
                                      pidx)
            # site scalers cancel in d1 = -L'/L (and per-rate scalers are
            # folded into the sumtable), so the derivative kernel sees zeros
            sp = sc = zeros_site
            np_pidx = np.asarray(pidx, np.int64)
            t_star = float(_newton_edge(
                st, u.length,
                jnp.asarray(part.rates, dtype),
                part._pinv_pc(pidx),
                jnp.asarray(part.eigenvals[np_pidx], dtype),
                part._freqs_pc(pidx),
                jnp.asarray(part.rate_weights, dtype),
                part._invariant_arr(),
                part._pattern_weights_arr(), sp, sc,
                sites=part.sites, per_rate=per_rate))

            if not np.isfinite(t_star):
                continue
            old = u.length
            # safeguarded acceptance with backtracking: keep the best
            # non-worsening candidate on the segment [old, t*]
            accepted = None
            cand = t_star
            for _ in range(4):
                part.update_prob_matrices(pidx, [u.pmatrix_index], [cand])
                new_logl = _edge_logl(part, u, pidx)
                if new_logl + 1e-12 >= logl:
                    accepted = (cand, new_logl)
                    break
                cand = 0.5 * (cand + old)
            if accepted is None:
                part.update_prob_matrices(pidx, [u.pmatrix_index], [old])
                continue
            t_acc, new_logl = accepted
            u.length = u.back.length = t_acc
            inc.invalidate_edge(u)
            logl = new_logl
            max_delta = max(max_delta, abs(t_acc - old))
        if max_delta < tol:
            break

    # final consistent evaluation at the canonical root
    pops = inc.create_partial_operations(inc.partial_traverse(root))
    if pops:
        part.update_partials(pops, pad_to=cap)
    logl = _edge_logl(part, root, pidx)
    return float(logl), sweep + 1
