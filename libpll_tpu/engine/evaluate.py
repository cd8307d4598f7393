"""Fused device pipelines: P-matrices → CLV sweep → log-likelihood in one jit.

The Partition class mirrors the reference's step-by-step API; this module is
the TPU-first composition of the same kernels into single compiled programs
(the host/device boundary of SURVEY §3.1): one call computes all transition
matrices, executes the whole post-order schedule with the level-major
throughput sweep (:mod:`libpll_tpu.ops.sweep`), and reduces the edge
log-likelihood — with every per-site array shardable over a device mesh and
the final reduction crossing the mesh as one psum inserted by XLA.

Topology (the operation schedule and evaluation edge) is baked into the
returned function as compile-time constants; model parameters and CLV state
are traced arguments, so branch-length or model changes never retrace.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import derivatives as deriv_ops
from ..ops import likelihood as lk_ops
from ..ops.pmatrix import compute_pmatrices
from ..ops.sweep import LevelSchedule, build_level_schedule, make_level_sweep
from ..utils.constants import SCALE_PER_RATE, SCALE_PER_SITE


class EvalTopology(NamedTuple):
    """Static description of one evaluation: schedule + evaluation edge.

    CLV/scaler indices are in the *level-major* space of the schedule
    (see ops/sweep.py); ``topology_from_tree`` performs the translation from
    the reference index conventions.
    """

    schedule: LevelSchedule
    matrix_indices: np.ndarray  # [B] int32
    n_pmatrices: int
    parent_clv: int
    child_clv: int
    edge_matrix: int
    sites: int
    scale_mode: int = SCALE_PER_SITE
    asc_mode: int = 0

    @property
    def dummy_scaler(self) -> int:
        return self.schedule.n_inner

    def scaler_row(self, clv_row: int) -> int:
        return (clv_row - self.schedule.tips
                if clv_row >= self.schedule.tips else self.dummy_scaler)


def topology_from_tree(tree, sites, scale_mode=SCALE_PER_SITE, asc_mode=0):
    """Static evaluation description from a UTree; returns (topo, branches)."""
    from ..tree import utree as ut

    trav = ut.traverse(tree.root)
    ops, branches, pmat_idx = ut.create_operations(trav)
    schedule = build_level_schedule(ops, tree.tip_count)
    root = tree.root

    return EvalTopology(
        schedule=schedule,
        matrix_indices=np.asarray(pmat_idx, dtype=np.int32),
        n_pmatrices=len(branches),
        parent_clv=schedule.clv_map[root.clv_index],
        child_clv=schedule.clv_map[root.back.clv_index],
        edge_matrix=root.pmatrix_index,
        sites=sites,
        scale_mode=scale_mode,
        asc_mode=asc_mode,
    ), np.asarray(branches)


def _pmatrices(model, topo, dtype):
    pmat = compute_pmatrices(
        model["branch_lengths"], model["rates"], model["prop_invar"],
        model["params_indices"], model["eigenvals"], model["left"],
        model["right"], dtype=dtype)
    pmatrix = jnp.zeros((topo.n_pmatrices,) + pmat.shape[1:],
                        dtype=pmat.dtype)
    return pmatrix.at[jnp.asarray(topo.matrix_indices)].set(pmat)


def model_from_partition(partition, branches, params_indices=None,
                         dtype=None):
    """Assemble the traced model dict for the make_* pipelines from a
    Partition's parameter state (the step-by-step API's counterpart of
    the reference's partition fields).

    ``branches``: branch lengths in traversal order (from
    create_operations).  ``params_indices``: per-category rate-matrix
    indices (defaults to all zeros).  ``dtype`` defaults to float32 (the
    fused kernels' fast path).
    """
    from ..models.gtr import eigen_decompose

    dtype = dtype or jnp.float32
    C = partition.rate_cats
    pidx = np.zeros(C, np.int32) if params_indices is None else \
        np.asarray(params_indices, np.int32)

    evals, lefts, rights = [], [], []
    for k in range(partition.rate_matrices):
        w, left, right = eigen_decompose(partition.subst_params[k],
                                         partition.frequencies[k])
        evals.append(w)
        lefts.append(left)
        rights.append(right)

    freqs_pc = np.stack([partition.frequencies[i] for i in pidx])
    pinv_pc = np.asarray([partition.prop_invar[i] for i in pidx])
    invariant = (np.asarray(partition.invariant)
                 if getattr(partition, "invariant", None) is not None
                 else np.full(partition.sites_alloc, -1, np.int32))

    return {
        "branch_lengths": jnp.asarray(branches, dtype),
        "rates": jnp.asarray(partition.rates, dtype),
        "prop_invar": jnp.asarray(partition.prop_invar, dtype),
        "params_indices": jnp.asarray(pidx),
        "eigenvals": jnp.asarray(np.stack(evals), dtype),
        "left": jnp.asarray(np.stack(lefts), dtype),
        "right": jnp.asarray(np.stack(rights), dtype),
        "freqs_pc": jnp.asarray(freqs_pc, dtype),
        "prop_invar_pc": jnp.asarray(pinv_pc, dtype),
        "rate_weights": jnp.asarray(partition.rate_weights, dtype),
        "pattern_weights": jnp.asarray(partition.pattern_weights, dtype),
        "invariant": jnp.asarray(invariant, jnp.int32),
    }


def make_forward(topo: EvalTopology):
    """Build ``forward(model, clv, scalers) -> (logl, persite)``.

    model: dict of traced arrays — branch_lengths [B], rates [C],
      prop_invar [M], params_indices [C] int32, eigenvals [M,S],
      left/right [M,S,S], freqs_pc [C,S], prop_invar_pc [C],
      rate_weights [C], pattern_weights [L], invariant [L] int32.
    clv: [tips + n_inner, C, S, L] level-major; scalers [n_inner+1, (C,) L].
    """
    sweep = make_level_sweep(topo.schedule, topo.scale_mode)
    per_rate = topo.scale_mode == SCALE_PER_RATE
    sp = topo.scaler_row(topo.parent_clv)
    sc = topo.scaler_row(topo.child_clv)

    def forward(model, clv, scalers):
        pmatrix = _pmatrices(model, topo, clv.dtype)
        clv, scalers = sweep(clv, scalers, pmatrix)
        logl, persite = lk_ops.edge_loglikelihood(
            clv[topo.parent_clv], clv[topo.child_clv],
            scalers[sp], scalers[sc],
            pmatrix[topo.edge_matrix], model["freqs_pc"],
            model["rate_weights"], model["pattern_weights"],
            model["prop_invar_pc"], model["invariant"], sites=topo.sites,
            per_rate=per_rate, asc_mode=topo.asc_mode)
        return logl, persite

    return forward


def make_forward_fused(topo: EvalTopology, rate_cats: int, states: int,
                       impl: str = "auto", interpret: bool = False):
    """Fused-Pallas forward: P-matrices → fused VMEM-resident pruning sweep
    → edge log-likelihood, one compiled program (the TPU fast path).

    Returns ``forward(model, tips_packed) -> (logl, persite, inner, scalers)``
    where ``tips_packed`` is :func:`libpll_tpu.ops.clv_pallas.pack_tips`
    (plus :func:`~libpll_tpu.ops.clv_pallas.pad_sites_packed` when the
    allocated site count is not a multiple of the kernel block) applied
    once to the [tips, C, S, L] tip CLVs (tips are constant after setup).
    ``inner`` is returned in the packed (padded) layout for reuse
    (derivatives, partial re-evaluation).

    Ascertainment-bias corrections are supported: the ``states``
    pseudo-site columns ride the site axis through the fused sweep exactly
    as in the XLA path; only the final fold (in XLA) distinguishes them.
    The padding lanes are sliced off before the fold so Lewis/Felsenstein
    base likelihoods see only the real asc columns.
    """
    from ..ops import clv_pallas as cp

    sweep = cp.make_fused_sweep(topo.schedule, topo.scale_mode, impl=impl,
                                rate_cats=rate_cats, states=states,
                                interpret=interpret)
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    per_rate = topo.scale_mode == SCALE_PER_RATE
    tips = topo.schedule.tips
    sp = topo.scaler_row(topo.parent_clv)
    sc = topo.scaler_row(topo.child_clv)

    def row(tips_packed, inner, idx, L):
        packed = (tips_packed[idx] if idx < tips else inner[idx - tips])
        return cp.unpack_clv(packed[..., :L], rate_cats, states, impl)

    def forward(model, tips_packed):
        L = model["pattern_weights"].shape[-1]  # allocated (real) length
        pmatrix = _pmatrices(model, topo, tips_packed.dtype)
        inner, scalers = sweep(tips_packed, pmatrix)
        logl, persite = lk_ops.edge_loglikelihood(
            row(tips_packed, inner, topo.parent_clv, L),
            row(tips_packed, inner, topo.child_clv, L),
            scalers[sp][..., :L], scalers[sc][..., :L],
            pmatrix[topo.edge_matrix], model["freqs_pc"],
            model["rate_weights"], model["pattern_weights"],
            model["prop_invar_pc"], model["invariant"], sites=topo.sites,
            per_rate=per_rate, asc_mode=topo.asc_mode)
        return logl, persite, inner, scalers

    return forward


def make_asc_tail(topo: EvalTopology, rate_cats: int, states: int):
    """Ascertainment-bias correction as an XLA side-sweep over the S
    pseudo-columns (one all-one-state column per state; reference
    `src/pll.c:490-495`): a full pruning pass over just S sites is a few
    thousand FLOPs even at 10k taxa, so the fast score kernels stay
    asc-free and the correction composes with *every* scoring path
    (fused / segmented / dyn / sharded).  Numerics are bit-identical to
    :func:`make_forward`'s asc path (same level sweep, same fold).

    Returns ``tail(model, pmatrix) -> correction`` where ``model`` must
    carry ``asc_weights`` [S] (the per-state weights of
    `pll_set_asc_state_weights`; Lewis mode ignores them).
    """
    sweep = make_level_sweep(topo.schedule, topo.scale_mode)
    per_rate = topo.scale_mode == SCALE_PER_RATE
    tips, n_inner = topo.schedule.tips, topo.schedule.n_inner
    sp = topo.scaler_row(topo.parent_clv)
    sc = topo.scaler_row(topo.child_clv)
    asc_mode = topo.asc_mode

    def tail(model, pmatrix):
        dtype = pmatrix.dtype
        eye = jnp.eye(states, dtype=dtype)  # [state, column]
        tipclv = jnp.broadcast_to(eye[None, None],
                                  (tips, rate_cats, states, states))
        clv = jnp.concatenate(
            [tipclv, jnp.zeros((n_inner, rate_cats, states, states), dtype)],
            axis=0)
        sshape = ((n_inner + 1, rate_cats, states) if per_rate
                  else (n_inner + 1, states))
        clv, scalers = sweep(clv, jnp.zeros(sshape, jnp.int32), pmatrix)

        termb = jnp.einsum("cjk,ckn->cjn", pmatrix[topo.edge_matrix],
                           clv[topo.child_clv], preferred_element_type=dtype)
        term_r = jnp.einsum("cjn,cj,cjn->cn", clv[topo.parent_clv],
                            model["freqs_pc"].astype(dtype), termb)
        if per_rate:
            comb = scalers[sp] + scalers[sc]
            site_scal, diff = lk_ops._fold_rate_scalers(comb)
            term_r = lk_ops._apply_rate_fold(term_r, diff, dtype)
        else:
            site_scal = scalers[sp] + scalers[sc]
        sum_w_real = jnp.sum(model["pattern_weights"].astype(dtype))
        return lk_ops.asc_correction_terms(
            term_r, site_scal, model["rate_weights"].astype(dtype),
            model["asc_weights"].astype(dtype), sum_w_real, asc_mode, dtype)

    return tail


def _pinv_score_inputs(model, impl, dtype):
    """(weight_vec, inv_add) for the linear in-kernel prop-invar fold:
    ``Σ_c w_c[(1-p_c)·term_c + p_c·f_c[inv]]`` splits into a re-scaled
    weight vector and a per-site additive term (reference mix order,
    `src/core_likelihood.c:960-978`: per-rate scalers fold into term_c
    first; the invariant likelihood enters unscaled)."""
    from ..ops import clv_pallas as cp

    freqs = model["freqs_pc"].astype(dtype)          # [C, S]
    pinv = model["prop_invar_pc"].astype(dtype)      # [C]
    rw = model["rate_weights"].astype(dtype)         # [C]
    inv = model["invariant"]                         # [L] int32
    wvec = cp.pack_weight_vec(freqs * (1.0 - pinv)[:, None], rw, impl)
    has = inv >= 0
    inv_lk = jnp.where(has[None, :], freqs[:, jnp.maximum(inv, 0)], 0.0)
    inv_add = jnp.einsum("c,cn->n", rw * pinv, inv_lk)[None, :]  # [1, L]
    return wvec, inv_add


def make_score(topo: EvalTopology, rate_cats: int, states: int,
               impl: str = "auto", use_pinv: bool = False,
               tip_encoding: str = "clv", mxu_precision: str = "highest",
               interpret: bool = False):
    """Tree-search scoring fast path: P-matrices → fused in-VMEM sweep with
    the edge log-likelihood folded into the kernel (inner CLVs never touch
    HBM).  Scope: per-site/no scaling; +I via the linear in-kernel fold
    (``use_pinv``); asc-bias (topo.asc_mode) via the XLA pseudo-column
    side-sweep (:func:`make_asc_tail`) — the full GTR(+Γ)(+I / +asc)
    search configuration.  ``tip_encoding="chars"``: ``tips_packed`` is
    :func:`~libpll_tpu.ops.clv_pallas.pack_tipchars` nibble words decoded
    in VMEM (0.5 byte/tip/site — cuts the kernel's only HBM stream 64×
    for DNA).

    Returns ``score(model, tips_packed) -> logl``.
    """
    from ..ops import clv_pallas as cp

    if topo.asc_mode and use_pinv:
        raise ValueError("asc-bias and prop-invar are mutually exclusive")
    score_kernel = cp.make_fused_edge_score(
        topo.schedule, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        topo.scale_mode, impl=impl, rate_cats=rate_cats, states=states,
        use_pinv=use_pinv, tip_encoding=tip_encoding,
        mxu_precision=mxu_precision, interpret=interpret)
    asc_tail = (make_asc_tail(topo, rate_cats, states)
                if topo.asc_mode else None)
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"

    def score(model, tips_packed):
        dtype = (model["freqs_pc"].dtype if tip_encoding in
                 ("chars", "masks") else tips_packed.dtype)
        pmatrix = _pmatrices(model, topo, dtype)
        pw = model["pattern_weights"].astype(dtype)[None, :]
        if use_pinv:
            wvec, inv_add = _pinv_score_inputs(model, impl, dtype)
            logl = score_kernel(tips_packed, pmatrix, wvec, pw, inv_add)
        else:
            wvec = cp.pack_weight_vec(model["freqs_pc"].astype(dtype),
                                      model["rate_weights"].astype(dtype),
                                      impl)
            logl = score_kernel(tips_packed, pmatrix, wvec, pw)
        if asc_tail is not None:
            logl = logl + asc_tail(model, pmatrix)
        return logl

    return score


def make_score_sharded(topo: EvalTopology, rate_cats: int, states: int,
                       mesh, impl: str = "auto", use_pinv: bool = False,
                       interpret: bool = False):
    """Multi-chip fused scoring: tips packed and sharded on the sites axis,
    each device runs the fused edge-score kernel on its local site shard
    (per-site scaling is shard-local by construction), and the partial
    log-likelihoods meet in one psum over ICI — the entire cross-device
    traffic of a full-tree evaluation (SURVEY §2.4/§5.8).  +I rides the
    in-kernel fold with ``inv_add`` sharded like the sites; the asc-bias
    pseudo-column sweep (:func:`make_asc_tail`) runs replicated outside
    the shard_map (S columns — no reason to shard).

    Returns ``score(model, tips_packed) -> logl`` where ``tips_packed`` is
    sharded [tips, C*S, L] (L divisible by mesh size × the kernel's site
    block).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import clv_pallas as cp
    from ..parallel.mesh import SITES_AXIS

    if topo.asc_mode and use_pinv:
        raise ValueError("asc-bias and prop-invar are mutually exclusive")
    score_kernel = cp.make_fused_edge_score(
        topo.schedule, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        topo.scale_mode, impl=impl, rate_cats=rate_cats, states=states,
        use_pinv=use_pinv, interpret=interpret)
    asc_tail = (make_asc_tail(topo, rate_cats, states)
                if topo.asc_mode else None)
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"

    def score(model, tips_packed):
        dtype = tips_packed.dtype
        pmatrix = _pmatrices(model, topo, dtype)
        pw = model["pattern_weights"].astype(dtype)[None, :]
        if use_pinv:
            wvec, inv_add = _pinv_score_inputs(model, impl, dtype)
        else:
            wvec = cp.pack_weight_vec(model["freqs_pc"].astype(dtype),
                                      model["rate_weights"].astype(dtype),
                                      impl)
            inv_add = jnp.zeros((1, pw.shape[-1]), dtype)

        def local(tp, pmat, wv, pwl, inv):
            part = (score_kernel(tp, pmat, wv, pwl, inv) if use_pinv
                    else score_kernel(tp, pmat, wv, pwl))
            return jax.lax.psum(part, SITES_AXIS)

        # check_vma=False: pallas_call's out_shape carries no varying-axis
        # metadata, which the vma checker would otherwise reject
        fn = shard_map(
            local, mesh=mesh,
            in_specs=(P(None, None, SITES_AXIS), P(), P(),
                      P(None, SITES_AXIS), P(None, SITES_AXIS)),
            out_specs=P(), check_vma=False)
        logl = fn(tips_packed, pmatrix, wvec, pw, inv_add)
        if asc_tail is not None:
            logl = logl + asc_tail(model, pmatrix)
        return logl

    return score


def _pick_dyn_score_layout(schedule, rate_cats: int, states: int,
                           sites: int, ensure_rows):
    """(block_sites, DynSchedule) for the dyn score tier.

    Measured on the chip (2026-08-20, chain-pair timing): per-block
    overhead dominates the dyn kernels at the default 128-site block
    when trees are small-to-mid — 64×262k: 6.21 ms at bl=128 vs 3.17 at
    256; 1024×16k: 8.89 at 128 vs 2.77 at 512 (21 segments); 4096×8192:
    16.1 at 128 vs 6.54 at 512 (~68 segments) — but the per-(segment ×
    site-block) boundary restaging inverts it at giant scale: 10 240 ×
    131 072 measured 0.90 s at bl=128 (36 segments), 1.89 s at 256 (80)
    and 4.59 s at 512 (221).  Two further exceptions: forcing a
    one-segment tree to split (64×262k at 512: 2 segments, 3.60 ms —
    worse than 256's single segment), and blocks past 512, where the row
    budget collapses (bl=1024: 32 rows, 83 segments, 8.53 ms at
    1024×16k).  Rule, matching the best measured choice at all four
    configs: the widest candidate that keeps ONE segment; else the
    widest whose segments × site-blocks stays under ~4k (wide wins up to
    ~1.1k measured, narrow wins from ~37k; the cut sits between); else
    128."""
    from ..ops import clv_pallas_dyn as cpd

    cs = rate_cats * states
    candidates = [bs for bs in (512, 256, 128) if sites % bs == 0] or [128]
    builds = []
    for bs in candidates:
        rows = 2 * cpd._dyn_max_rows(cs, 4, bs)
        if bs != candidates[-1]:
            # cheap pre-check: segments >= ceil(n_inner / row budget), so
            # a width that provably can't reach one segment NOR pass the
            # <=4k cut would be built only to be discarded — at giant
            # scale those widest builds are exactly the most expensive
            # segmentation walks
            min_segs = -(-schedule.n_inner // rows)
            if min_segs > 1 and min_segs * (sites // bs) > 4000:
                continue
        dyn = cpd.build_dyn_schedule(
            schedule, rate_cats=rate_cats, states=states, max_rows=rows,
            block_sites=bs, ensure_rows=ensure_rows)
        if len(dyn.segments) == 1:
            return bs, dyn
        builds.append((bs, dyn))
    for bs, dyn in builds:  # widest first
        if len(dyn.segments) * (sites // bs) <= 4000:
            return bs, dyn
    return builds[-1]


def make_score_unbounded(topo: EvalTopology, rate_cats: int, states: int,
                         tip_masks, use_pinv: bool = False,
                         mxu_precision: str = "highest",
                         interpret: bool = False):
    """Tree-search scoring for trees of any size (data-driven segmented
    kernels, O(1) compile cost) with pattern-tip storage: 0.5 byte/tip/site
    for ≤4-bit alphabets (DNA), 4 bytes for wide alphabets (protein
    20-bit ambiguity masks) — both decoded to 0/1 CLV rows in VMEM.
    +I via the linear in-kernel fold (``use_pinv``); asc-bias
    (topo.asc_mode) via the XLA pseudo-column side-sweep.

    ``tip_masks``: [tips, sites] integer ambiguity bitmasks
    (Partition._tip_masks or io.maps.encode_sequence output).
    Returns ``score(model) -> logl``; tip data is baked at build time
    (tips are constant after setup).
    """
    from ..ops import clv_pallas as cp
    from ..ops import clv_pallas_dyn as cpd

    if topo.asc_mode and use_pinv:
        raise ValueError("asc-bias and prop-invar are mutually exclusive")
    # score kernels hold no per-local output slabs (exports only), so they
    # afford ~2x the sweep path's VMEM row budget (measured on TPU at
    # 4096x8192: 18.0 ms (default rows) -> 16.1 ms (2x), regressing again
    # beyond ~3x); the site-block width trades against segment count —
    # see _pick_dyn_score_layout for the measured rule
    masks = np.asarray(tip_masks)
    bs, dyn = _pick_dyn_score_layout(
        topo.schedule, rate_cats, states, masks.shape[1],
        [topo.parent_clv, topo.child_clv])
    enc = "chars" if int(masks.max()) <= 0xF else "masks"
    impl = "vpu" if states <= 8 else "mxu"
    slabs = (cpd.pack_tipchars_dyn(masks, dyn) if enc == "chars"
             else cpd.pack_tipmasks_dyn(masks, dyn))
    tables, m_gathers, exp_tables = cpd.dyn_score_args(dyn)
    score_kernel = cpd.make_dyn_score(
        dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        topo.scale_mode, rate_cats=rate_cats, states=states,
        tip_encoding=enc, impl=impl, use_pinv=use_pinv,
        block_sites=bs, mxu_precision=mxu_precision, interpret=interpret)
    asc_tail = (make_asc_tail(topo, rate_cats, states)
                if topo.asc_mode else None)

    def score(model):
        dtype = model["freqs_pc"].dtype
        pmatrix = _pmatrices(model, topo, dtype)
        pw = model["pattern_weights"].astype(dtype)[None, :]
        if use_pinv:
            wvec, inv_add = _pinv_score_inputs(model, impl, dtype)
            logl = score_kernel(slabs, tables, m_gathers, exp_tables,
                                pmatrix, wvec, pw, inv_add)
        else:
            wvec = cp.pack_weight_vec(model["freqs_pc"],
                                      model["rate_weights"], impl)
            logl = score_kernel(slabs, tables, m_gathers, exp_tables,
                                pmatrix, wvec, pw)
        if asc_tail is not None:
            logl = logl + asc_tail(model, pmatrix)
        return logl

    return score


def make_score_unbounded_sharded(topo: EvalTopology, rate_cats: int,
                                 states: int, tip_masks, mesh,
                                 use_pinv: bool = False,
                                 interpret: bool = False):
    """Multi-chip data-driven scoring: the dyn tier (pattern-tip slabs,
    O(1) compile cost, unbounded tree size) under ``shard_map`` — each
    device runs every segment's kernel on its local site shard (per-site
    scaling is shard-local by construction; schedule tables, coefficient
    tiles and P-matrices replicate) and the partial log-likelihoods meet
    in ONE psum over ICI.  This is the 10k-taxa × 1M-site configuration of
    BASELINE.json: nibble-packed tips sharded over the mesh.

    Returns ``score(model) -> logl``; slab site length must divide
    mesh size × the kernel's site block (auto-picked from {128, 256,
    512} per _pick_dyn_score_layout; 128 is always viable, and
    per-device shares divisible by 256/512 unlock the measured
    2.5–3.2× faster wide layouts).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import clv_pallas as cp
    from ..ops import clv_pallas_dyn as cpd
    from ..parallel.mesh import SITES_AXIS

    if topo.asc_mode and use_pinv:
        raise ValueError("asc-bias and prop-invar are mutually exclusive")
    masks = np.asarray(tip_masks)
    # the block must divide each device's LOCAL site share; slabs shard
    # only over SITES_AXIS (P(None, SITES_AXIS) below)
    n_shards = int(mesh.shape[SITES_AXIS])
    bs, dyn = _pick_dyn_score_layout(
        topo.schedule, rate_cats, states, masks.shape[1] // n_shards,
        [topo.parent_clv, topo.child_clv])
    enc = "chars" if int(masks.max()) <= 0xF else "masks"
    impl = "vpu" if states <= 8 else "mxu"
    slabs = tuple(cpd.pack_tipchars_dyn(masks, dyn) if enc == "chars"
                  else cpd.pack_tipmasks_dyn(masks, dyn))
    tables, m_gathers, exp_tables = cpd.dyn_score_args(dyn)
    tables, m_gathers = tuple(tables), tuple(m_gathers)
    exp_tables = tuple(exp_tables)
    score_kernel = cpd.make_dyn_score(
        dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        topo.scale_mode, rate_cats=rate_cats, states=states,
        tip_encoding=enc, impl=impl, use_pinv=use_pinv,
        block_sites=bs, interpret=interpret)
    asc_tail = (make_asc_tail(topo, rate_cats, states)
                if topo.asc_mode else None)

    shard_sites = P(None, SITES_AXIS)
    repl = P()

    def score(model):
        dtype = model["freqs_pc"].dtype
        pmatrix = _pmatrices(model, topo, dtype)
        pw = model["pattern_weights"].astype(dtype)[None, :]
        if use_pinv:
            wvec, inv_add = _pinv_score_inputs(model, impl, dtype)
        else:
            wvec = cp.pack_weight_vec(model["freqs_pc"],
                                      model["rate_weights"], impl)
            inv_add = jnp.zeros((1, pw.shape[-1]), dtype)

        def local(slabs_l, pmat, wv, pwl, inv_l):
            part = score_kernel(list(slabs_l), tables, m_gathers,
                                exp_tables, pmat, wv, pwl,
                                inv_l if use_pinv else None)
            return jax.lax.psum(part, SITES_AXIS)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(tuple(shard_sites for _ in slabs), repl, repl,
                      shard_sites, shard_sites),
            out_specs=repl, check_vma=False)
        logl = fn(slabs, pmatrix, wvec, pw, inv_add)
        if asc_tail is not None:
            logl = logl + asc_tail(model, pmatrix)
        return logl

    return score


def make_train_step_fused(topo: EvalTopology, rate_cats: int, states: int,
                          impl: str = "auto", interpret: bool = False):
    """Newton branch-length optimization on the fused-Pallas path: fused
    sweep → edge logL → sumtable (once) → device-resident Newton while_loop
    (SURVEY §3.3), all in one compiled program.

    Returns ``step(model, tips_packed) -> (logl, t_star)``.
    """
    from ..ops import clv_pallas as cp

    fwd = make_forward_fused(topo, rate_cats, states, impl=impl,
                             interpret=interpret)
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    per_rate = topo.scale_mode == SCALE_PER_RATE
    tips = topo.schedule.tips
    sp = topo.scaler_row(topo.parent_clv)
    sc = topo.scaler_row(topo.child_clv)
    MIN_T, MAX_T = 1e-8, 100.0

    def row(tips_packed, inner, idx, L):
        packed = tips_packed[idx] if idx < tips else inner[idx - tips]
        return cp.unpack_clv(packed[..., :L], rate_cats, states, impl)

    def step(model, tips_packed):
        logl, _, inner, scalers = fwd(model, tips_packed)
        dtype = tips_packed.dtype
        L = model["pattern_weights"].shape[-1]
        clv_p = row(tips_packed, inner, topo.parent_clv, L)
        clv_c = row(tips_packed, inner, topo.child_clv, L)
        left_pc = model["left"][model["params_indices"]].astype(dtype)
        right_pc = model["right"][model["params_indices"]].astype(dtype)
        evals_pc = model["eigenvals"][model["params_indices"]].astype(dtype)
        sumtable = deriv_ops.update_sumtable(
            clv_p, clv_c, scalers[sp][..., :L], scalers[sc][..., :L],
            model["freqs_pc"].astype(dtype), left_pc, right_pc,
            per_rate=per_rate)

        t0 = model["branch_lengths"][-1]
        zeros_site = jnp.zeros((L,), dtype=jnp.int32)

        def cond(carry):
            t, d1, it = carry
            return (jnp.abs(d1) > 1e-9) & (it < 32)

        def body(carry):
            t, _, it = carry
            d1, d2 = deriv_ops.likelihood_derivatives(
                sumtable, t, model["rates"].astype(dtype),
                model["prop_invar_pc"].astype(dtype), evals_pc,
                model["freqs_pc"].astype(dtype),
                model["rate_weights"].astype(dtype),
                model["invariant"],
                model["pattern_weights"].astype(dtype),
                zeros_site, zeros_site, sites=topo.sites,
                asc_mode=topo.asc_mode)
            step_ = jnp.where(d2 != 0.0, d1 / d2, d1)
            t_new = jnp.clip(t - step_, MIN_T, MAX_T)
            return (t_new, d1, it + 1)

        big = jnp.asarray(jnp.inf, dtype=dtype)
        t_star, _, _ = jax.lax.while_loop(
            cond, body, (t0.astype(dtype), big, 0))
        return logl, t_star

    return step


def make_train_step(topo: EvalTopology):
    """Full "training" step: forward sweep + analytic Newton update of the
    evaluation edge's branch length (the optimization inner loop of SURVEY
    §3.3) — everything on device, one compiled program.

    Returns ``step(model, clv, scalers) -> (logl, t_new, clv, scalers)``.
    """
    sweep = make_level_sweep(topo.schedule, topo.scale_mode)
    per_rate = topo.scale_mode == SCALE_PER_RATE
    sp_row = topo.scaler_row(topo.parent_clv)
    sc_row = topo.scaler_row(topo.child_clv)

    MIN_T, MAX_T = 1e-8, 100.0

    def step(model, clv, scalers):
        pmatrix = _pmatrices(model, topo, clv.dtype)
        clv, scalers = sweep(clv, scalers, pmatrix)

        logl, _ = lk_ops.edge_loglikelihood(
            clv[topo.parent_clv], clv[topo.child_clv],
            scalers[sp_row], scalers[sc_row],
            pmatrix[topo.edge_matrix], model["freqs_pc"],
            model["rate_weights"], model["pattern_weights"],
            model["prop_invar_pc"], model["invariant"], sites=topo.sites,
            per_rate=per_rate, asc_mode=topo.asc_mode)

        # analytic Newton on the evaluation edge (sumtable once, then a
        # device-resident while_loop; reference examples/newton/newton.c)
        sp = scalers[sp_row]
        sc = scalers[sc_row]
        left_pc = model["left"][model["params_indices"]]
        right_pc = model["right"][model["params_indices"]]
        evals_pc = model["eigenvals"][model["params_indices"]]
        sumtable = deriv_ops.update_sumtable(
            clv[topo.parent_clv], clv[topo.child_clv], sp, sc,
            model["freqs_pc"], left_pc, right_pc, per_rate=per_rate)

        zeros_site = jnp.zeros((clv.shape[-1],), dtype=jnp.int32)
        sp_site = sp if not per_rate else zeros_site
        sc_site = sc if not per_rate else zeros_site

        t0 = model["branch_lengths"][-1]

        def cond(carry):
            t, d1, it = carry
            return (jnp.abs(d1) > 1e-9) & (it < 32)

        def body(carry):
            t, _, it = carry
            d1, d2 = deriv_ops.likelihood_derivatives(
                sumtable, t, model["rates"], model["prop_invar_pc"],
                evals_pc, model["freqs_pc"], model["rate_weights"],
                model["invariant"], model["pattern_weights"],
                sp_site, sc_site, sites=topo.sites, asc_mode=topo.asc_mode)
            step_ = jnp.where(d2 != 0.0, d1 / d2, d1)
            t_new = jnp.clip(t - step_, MIN_T, MAX_T)
            return (t_new, d1, it + 1)

        big = jnp.asarray(jnp.inf, dtype=clv.dtype)
        t_star, _, _ = jax.lax.while_loop(
            cond, body, (t0.astype(clv.dtype), big, 0))
        return logl, t_star, clv, scalers

    return step
