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
    from ..errors import ParamError
    from ..utils.constants import SCALE_PER_RATE

    if max_sweeps < 1:
        raise ParamError("max_sweeps must be >= 1")
    root = tree.root
    pidx = list(params_indices)
    per_rate = part.scale_mode == SCALE_PER_RATE
    # start small: per-step dirty subsets are O(1) on the pre-order sweep
    # (consecutive evaluation roots are adjacent); grow on demand instead
    # of padding every step to the full-schedule envelope, which would
    # make each partial update cost ~2x a full-tree sweep
    cap = pad_to or 32

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
                if len(pops) > cap:
                    cap = 1 << (len(pops) - 1).bit_length()
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
        part.update_partials(pops, pad_to=max(
            cap, 1 << (len(pops) - 1).bit_length()))
    logl = _edge_logl(part, root, pidx)
    return float(logl), sweep + 1


# ---------------------------------------------------------------------------
# device-resident full sweep: all 2n−3 edges in ONE compiled program
# ---------------------------------------------------------------------------
def make_sweep_program(n_nodes: int, n_scale_buffers: int, capacity: int,
                       *, sites: int, scale_mode: int):
    """Compile the whole branch-length sweep as one ``lax.scan`` over edges
    — schedule-as-data, like the SPR candidate scorer: per edge it replays
    the (padded) re-orientation op subset into the live buffers, builds the
    sumtable, runs the Newton while_loop, and accepts the new length only
    if the edge log-likelihood does not drop (rejection leaves the
    P-matrix untouched; the host's precomputed later op tables stay valid
    because recomputing an op is idempotent).

    On this environment one host→device dispatch costs ~40 ms, so the
    per-edge host loop is dispatch-bound at ~4 calls/edge; this program
    amortizes the whole sweep into a single dispatch.

    Returns ``sweep(clv, scalers, pmatrix, model, tables [E, K, 8],
    erows [E, 5], t0s [E]) -> (clv, scalers, pmatrix, t_out [E],
    logl [E])`` with erows = (parent_clv, parent_scaler_row, child_clv,
    child_scaler_row, pmatrix_index); scaler row NS is the zero dummy.
    """
    from functools import partial as _partial

    from ..ops import likelihood as lk_ops
    from ..ops.clv import _one_partial, _scale_consts
    from ..ops.pmatrix import compute_pmatrices
    from ..utils.constants import SCALE_NONE, SCALE_PER_RATE, SCALE_PER_SITE

    NS = n_scale_buffers
    per_rate = scale_mode == SCALE_PER_RATE

    @jax.jit
    def sweep(clv, scalers, pmatrix, model, tables, erows, t0s):
        dtype = clv.dtype
        thresh, factor = _scale_consts(dtype)
        freqs_pc = model["freqs_pc"].astype(dtype)
        rw = model["rate_weights"].astype(dtype)
        pw = model["pattern_weights"].astype(dtype)
        pidx = model["params_indices"]
        left_pc = model["left"][pidx].astype(dtype)
        right_pc = model["right"][pidx].astype(dtype)
        evals_pc = model["eigenvals"][pidx].astype(dtype)
        rates = model["rates"].astype(dtype)
        pinv_pc = model["prop_invar_pc"].astype(dtype)
        invariant = model["invariant"]
        zeros_site = jnp.zeros(scalers.shape[1:], jnp.int32)

        def edge_body(carry, ed):
            clv, scalers, pmatrix = carry
            table, er, t0 = ed
            p, psr, c, csr, midx = (er[k] for k in range(5))

            def op_body(cy, op):
                clv, scalers = cy
                pp, ps, c1, m1, s1, c2, m2, s2 = (op[k] for k in range(8))
                x = _one_partial(pmatrix[m1], clv[c1], pmatrix[m2],
                                 clv[c2], dtype)
                if scale_mode != SCALE_NONE:
                    has = ps != NS
                    if scale_mode == SCALE_PER_SITE:
                        mask = jnp.all(x < thresh, axis=(0, 1)) & has
                        x = jnp.where(mask[None, None, :], x * factor, x)
                    else:
                        mask = jnp.all(x < thresh, axis=1) & has
                        x = jnp.where(mask[:, None, :], x * factor, x)
                    new_scaler = (scalers[s1] + scalers[s2]
                                  + mask.astype(scalers.dtype))
                    scalers = scalers.at[ps].set(new_scaler)
                    scalers = scalers.at[NS].set(
                        jnp.zeros_like(scalers[NS]))
                clv = clv.at[pp].set(x)
                return (clv, scalers), None

            (clv, scalers), _ = jax.lax.scan(op_body, (clv, scalers),
                                             table)
            sp = scalers[psr] if per_rate else zeros_site
            sc = scalers[csr] if per_rate else zeros_site
            st = deriv_ops.update_sumtable(clv[p], clv[c], sp, sc,
                                           freqs_pc, left_pc, right_pc,
                                           per_rate=per_rate)

            z1 = jnp.zeros((st.shape[-1],), jnp.int32)

            def n_cond(cy):
                t, d1, it = cy
                return (jnp.abs(d1) > 1e-9) & (it < 32)

            def n_body(cy):
                t, _, it = cy
                d1, d2 = deriv_ops.likelihood_derivatives(
                    st, t, rates, pinv_pc, evals_pc, freqs_pc, rw,
                    invariant, pw, z1, z1, sites=sites, asc_mode=0)
                step = jnp.where(d2 != 0.0, d1 / jnp.abs(d2), d1)
                return (jnp.clip(t - step, MIN_BL, MAX_BL), d1, it + 1)

            big = jnp.asarray(jnp.inf, dtype)
            t_star, _, _ = jax.lax.while_loop(
                n_cond, n_body, (t0.astype(dtype), big, 0))

            pm_new = compute_pmatrices(
                t_star[None], rates, model["prop_invar"].astype(dtype),
                pidx, model["eigenvals"].astype(dtype),
                model["left"].astype(dtype), model["right"].astype(dtype),
                dtype=dtype)[0]

            def elogl(pm_row):
                sprow = scalers[psr] if scale_mode != SCALE_NONE else \
                    zeros_site
                scrow = scalers[csr] if scale_mode != SCALE_NONE else \
                    zeros_site
                logl, _ = lk_ops.edge_loglikelihood(
                    clv[p], clv[c], sprow, scrow, pm_row, freqs_pc, rw,
                    pw, pinv_pc, invariant, sites=sites,
                    per_rate=per_rate, asc_mode=0)
                return logl

            l_new = elogl(pm_new)
            l_old = elogl(pmatrix[midx])
            accept = l_new >= l_old
            pmatrix = pmatrix.at[midx].set(
                jnp.where(accept, pm_new, pmatrix[midx]))
            t_out = jnp.where(accept, t_star, t0.astype(dtype))
            return (clv, scalers, pmatrix), (t_out,
                                             jnp.maximum(l_new, l_old))

        (clv, scalers, pmatrix), (ts, logls) = jax.lax.scan(
            edge_body, (clv, scalers, pmatrix), (tables, erows, t0s))
        return clv, scalers, pmatrix, ts, logls

    return sweep


def optimize_branch_lengths_scan(tree, part, params_indices, *,
                                 max_sweeps: int = 8, tol: float = 1e-6,
                                 capacity: Optional[int] = None,
                                 program=None, edges=None,
                                 edge_pad: Optional[int] = None):
    """Branch-length optimization with the whole sweep device-resident:
    ONE compiled call optimizes all 2n−3 edges (vs ~4 dispatches per edge
    in :func:`optimize_branch_lengths`).  Per sweep the host replays the
    flag dynamics to precompute every edge's re-orientation op table (all
    data; `program` can be reused across sweeps/trees of the same
    envelope for zero recompiles).  Returns (final logL, sweeps used).

    ``edges`` (a set of pmatrix indices) restricts the sweep to a subset —
    the *local* optimization discipline after a topology move (the
    reference's `pll_utree_spr` hands back exactly the changed branches
    for this purpose, utree_moves.c:204-251).  ``edge_pad`` pads the edge
    axis to a fixed count by repeating the last edge, so one compiled
    program serves every subset size; repeats are harmless (replaying an
    op table is idempotent and acceptance is monotone: the repeat
    re-derives the same t* and re-accepts at equal likelihood).  Raises
    :class:`CapacityError` if the subset exceeds ``edge_pad``."""
    from ..engine.partition import operations_to_array
    from ..errors import ParamError
    from ..ops.incremental import pad_op_table
    from ..search.spr import _model_from_partition

    if max_sweeps < 1:
        raise ParamError("max_sweeps must be >= 1")
    root = tree.root
    pidx = list(params_indices)
    NS = part.scale_buffers

    trav = ut.traverse(root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices(pidx, midx, blens)
    part.update_partials(ops)
    inc.mark_valid(trav)
    logl = _edge_logl(part, root, pidx)

    def srow(si):
        return NS if si < 0 else si

    model = _model_from_partition(part, pidx)
    last_logl = logl
    for sweep_i in range(max_sweeps):
        # host replay: per-edge dirty tables under assume-accept dynamics
        tables, erows, t0s = [], [], []
        seen = set()
        for node in ut.traverse(root, ut.TRAVERSE_PREORDER):
            if node.pmatrix_index in seen:
                continue
            seen.add(node.pmatrix_index)
            if edges is not None and node.pmatrix_index not in edges:
                continue
            u = node if not node.is_tip else node.back
            pops = inc.create_partial_operations(inc.partial_traverse(u))
            if not pops:
                # idempotent stand-in: recompute u from its children
                from ..engine.partition import Operation
                pops = [Operation(
                    u.clv_index, u.scaler_index,
                    u.next.back.clv_index, u.next.back.pmatrix_index,
                    u.next.back.scaler_index, u.next.next.back.clv_index,
                    u.next.next.back.pmatrix_index,
                    u.next.next.back.scaler_index)]
            tables.append(operations_to_array(pops, NS))
            erows.append((u.clv_index, srow(u.scaler_index),
                          u.back.clv_index, srow(u.back.scaler_index),
                          u.pmatrix_index))
            t0s.append(u.length)
            inc.invalidate_edge(u)  # assume accepted

        if not tables:
            break  # empty subset: nothing to optimize
        n_real = len(tables)
        if edge_pad is not None:
            from ..errors import CapacityError
            if n_real > edge_pad:
                raise CapacityError(
                    f"edge subset ({n_real}) exceeds edge_pad ({edge_pad})")
            tables += [tables[n_real - 1]] * (edge_pad - n_real)
            erows += [erows[n_real - 1]] * (edge_pad - n_real)
            t0s += [t0s[n_real - 1]] * (edge_pad - n_real)
        cap = capacity or max(
            8, 1 << (max(t.shape[0] for t in tables) - 1).bit_length())
        tab = np.stack([pad_op_table(t, cap) for t in tables])
        er = np.asarray(erows, np.int32)
        t0 = np.asarray(t0s)

        if program is None:
            program = make_sweep_program(part.nodes, NS, cap,
                                         sites=part.sites,
                                         scale_mode=part.scale_mode)
        part.clv, part.scalers, part.pmatrix, ts, logls = program(
            part.clv, part.scalers, part.pmatrix, model, jnp.asarray(tab),
            jnp.asarray(er), jnp.asarray(t0, part.dtype))

        ts = np.asarray(ts)
        k = 0
        seen = set()
        max_delta = 0.0
        for node in ut.traverse(root, ut.TRAVERSE_PREORDER):
            if node.pmatrix_index in seen:
                continue
            seen.add(node.pmatrix_index)
            if edges is not None and node.pmatrix_index not in edges:
                continue
            u = node if not node.is_tip else node.back
            max_delta = max(max_delta, abs(float(ts[k]) - u.length))
            u.length = u.back.length = float(ts[k])
            k += 1
        assert k == n_real, (k, n_real)
        logl = float(np.asarray(logls)[-1])
        if max_delta < tol or logl <= last_logl + 1e-10:
            break
        last_logl = logl
    return logl, sweep_i + 1
