"""Fused Pallas pruning-sweep kernel — the TPU fast path for CLV updates.

Same math and scaling semantics as :func:`libpll_tpu.ops.sweep.make_level_sweep`
(which remains the in-tree reference implementation, mirroring libpll's
generic-vs-SIMD kernel duality; reference inner loop:
`src/core_partials.c:607-663`, SIMD variants `src/core_partials_avx2.c`),
restructured around the TPU memory hierarchy:

  * the grid runs over **site blocks**; for each block the *entire tree's*
    CLV working set lives in VMEM — tip CLVs stream in once, inner CLVs
    stream out once, and every intermediate parent/child handoff happens
    on-chip.  HBM traffic per (site,rate,node) update drops to
    ~1 write + amortized tip read (~32 B at f32/DNA), versus 3+ full
    streams for the gather/scatter XLA formulation;
  * the per-rate `[S,S] @ [S,block]` contractions of one node are fused
    into a single `[C·S, C·S] @ [C·S, block]` matmul against a
    block-diagonal P-matrix, putting sites on the MXU lane axis;
  * the post-order schedule is static (baked at trace time as an unrolled
    op list), so there is no dynamic control flow anywhere in the kernel.

Numerical scaling matches the reference exactly: when every entry of a
site's span falls below 2**-shift the span is multiplied by 2**shift and the
per-site exponent counter is incremented; a parent's counter starts as the
sum of its children's (`fill_parent_scaler`, `core_partials.c:24-46`).
Counter bookkeeping mirrors ops/sweep.py row-for-row so outputs are
bit-comparable between the two paths.

Supported configuration: per-site, per-rate, or no scaling; any
states/rate_cats; sites divisible by the block size.
``fused_sweep_supported`` reports applicability; callers fall back to the
XLA sweep otherwise.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import (SCALE_NONE, SCALE_PER_RATE, SCALE_PER_SITE,
                               scale_shift_bits)
from .clv import _scale_consts
from .sweep import LevelSchedule

# Leave headroom below the ~16 MB/core VMEM for double-buffered pipelining.
_VMEM_BUDGET = 10 * 1024 * 1024


def _flatten_ops(schedule: LevelSchedule):
    """Static (inner_row, c1, m1, c2, m2, s1, s2, has_scaler) tuples in
    post-order (level order); children always precede parents."""
    tips = schedule.tips
    ops = []
    for lev in schedule.levels:
        for k in range(len(lev.child1)):
            ops.append((
                lev.offset + k - tips,
                int(lev.child1[k]), int(lev.matrix1[k]),
                int(lev.child2[k]), int(lev.matrix2[k]),
                int(lev.scaler1[k]), int(lev.scaler2[k]),
                bool(lev.has_scaler[k]),
            ))
    return ops


def _pick_block_sites(n_nodes: int, cs: int, sites: int, itemsize: int,
                      n_scaler_rows: int) -> Optional[int]:
    """Largest 128-multiple block that fits the working set in VMEM and
    divides the site count; None if no such block exists."""
    best = None
    bl = 128
    while True:
        # in+out CLV slabs and the scaler slab, all double-buffered
        need = 2 * (n_nodes * cs * bl * itemsize + n_scaler_rows * bl * 4)
        if need > _VMEM_BUDGET:
            break
        if sites % bl == 0:
            best = bl
        bl += 128
    return best


def block_diag_pmatrices(pmatrix: jax.Array) -> jax.Array:
    """[M, C, S, S] per-rate transition matrices -> [M, C*S, C*S]
    block-diagonal, so one matmul applies all rate categories at once."""
    m, c, s, _ = pmatrix.shape
    eye = jnp.eye(c, dtype=pmatrix.dtype)
    out = jnp.einsum("mcij,cd->mcidj", pmatrix, eye)
    return out.reshape(m, c * s, c * s)


def roll_coeff_pmatrices(pmatrix: jax.Array) -> jax.Array:
    """[M, C, S, S] -> [M, S*C, S] coefficient tables for the VPU-roll
    contraction in *state-major* row layout (row = s*C + c):

        out[s*C + c] = sum_d  A[s*C + c, d] * roll(clv, -d*C)[s*C + c]
        A[s*C + c, d] = P[c, s, (s + d) % S]

    A cyclic sublane roll by d*C aligns child state (s+d)%S with parent
    state s in every rate lane simultaneously — the [S,S] contraction
    becomes S fused multiply-adds on full [S*C, block] tiles (pure VPU,
    no MXU small-matmul overhead).  The S roll-columns share one lane tile
    per matrix (in-kernel slice ``coeff[m, :, d:d+1]``), so the VMEM
    footprint stays ~128 lanes per matrix regardless of S."""
    m, c, s, _ = pmatrix.shape
    pm = jnp.transpose(pmatrix, (0, 2, 3, 1))  # [M, S(parent), S(child), C]
    si = np.arange(s)
    gather = (si[None, :] + si[:, None]) % s  # [d, s] -> child state
    a = pm[:, si[None, :], gather, :]  # [M, d, s, C]
    return jnp.transpose(a, (0, 2, 3, 1)).reshape(m, s * c, s)


def tip_coeff_pmatrices(pmatrix: jax.Array, impl: str) -> jax.Array:
    """[M, C, S, S] -> [M, C*S, S] tip-term coefficient tables: column d is
    the transition-matrix column for child state d, rows in the packed
    layout of ``impl`` (state-major s*C+c for "vpu", rate-major c*S+s for
    "mxu").  Against a pattern tip's 0/1 indicator CLV the contraction
    collapses to

        (P @ tip)[row] = sum_d tipcoeff[row, d] * bit_d(code)

    with ``bit_d`` a [1, L] lane row — no sublane rolls and no decoded
    [C*S, L] tile.  This is the reference's tip-lookup specialisation
    (`src/core_partials.c` `..._ti` kernels / `set_tipclv`,
    `src/pll.c:925-931`) recast for the VPU: the bit walk over
    ambiguity-code bits happens per lane instead of per site.  Rows are
    state-major (s*C + c) — the VPU packed layout; the MXU path keeps
    decode + block-diag matmul (see make_fused_edge_score) and never
    uses these tables."""
    assert impl == "vpu", "tip-term tables exist only for the VPU path"
    m, c, s, _ = pmatrix.shape
    pm = jnp.transpose(pmatrix, (0, 2, 1, 3))  # [M, S(parent), C, Sc]
    return pm.reshape(m, c * s, s)


def coeff_lane_width(impl: str, states: int, rate_cats: int) -> int:
    """Lane width of one matrix's coefficient tile: S roll-columns (vpu) or
    C*S matmul columns (mxu)."""
    return states if impl == "vpu" else rate_cats * states


def lane_pack_coeff(coeff: jax.Array, lane_width: int) -> jax.Array:
    """[M, C*S, w] -> [ceil(M·w/128), C*S, 128]: pack 128//w matrices into
    each 128-lane tile so the in-VMEM coefficient footprint is ~w lanes per
    matrix instead of a full padded tile (32× smaller for DNA roll tables).
    In-kernel addressing: matrix m lives at tile m // per, lanes
    (m % per)·w .. +w with per = 128 // w."""
    m, cs, w = coeff.shape
    assert w == lane_width
    per = max(1, 128 // w)
    g = -(-m // per)
    pad = g * per - m
    if pad:
        coeff = jnp.concatenate(
            [coeff, jnp.zeros((pad, cs, w), coeff.dtype)], axis=0)
    packed = coeff.reshape(g, per, cs, w).transpose(0, 2, 1, 3)
    return packed.reshape(g, cs, per * w)


def mxu_dot(a: jax.Array, x: jax.Array, dtype, precision: str) -> jax.Array:
    """In-kernel MXU dot at a named precision tier.

    ``"highest"`` is f32-exact (≈6 bf16 MXU passes); ``"high"`` is bf16x3
    — both operands split into bf16 hi/lo halves and the three significant
    cross products accumulated in f32 (3 MXU passes, ~2× the throughput of
    "highest"; the dropped lo·lo term is below f32 ulp).  Implemented
    manually because Mosaic's dot lowering accepts only DEFAULT/HIGHEST;
    ``"default"`` (1 bf16-grade pass) passes through."""
    if precision != "high":
        return jnp.dot(a, x, preferred_element_type=dtype,
                       precision=precision)
    f32 = jnp.float32
    ah = a.astype(jnp.bfloat16)
    al = (a.astype(f32) - ah.astype(f32)).astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    xl = (x.astype(f32) - xh.astype(f32)).astype(jnp.bfloat16)
    # explicit DEFAULT: bf16 operands with an inherited HIGHEST would ask
    # Mosaic for an fp32-contract matmul on bf16 inputs (rejected)
    acc = jnp.dot(ah, xh, preferred_element_type=f32, precision="default")
    acc += jnp.dot(ah, xl, preferred_element_type=f32, precision="default")
    acc += jnp.dot(al, xh, preferred_element_type=f32, precision="default")
    return acc.astype(dtype)


def make_contract(impl: str, states: int, rate_cats: int, dtype,
                  mxu_precision: str = "highest"):
    """In-kernel contraction: child CLV block [C*S, bl] -> parent block.
    ``coeff_ref`` holds lane-packed tables (see lane_pack_coeff).

    ``mxu_precision``: MXU pass count for the wide-alphabet dot.
    ``"highest"`` (default) is f32-exact; ``"high"`` (bf16x3, TPU only)
    roughly halves MXU time on the protein path, which runs at ~80% of
    the f32-highest MXU ceiling — opt in only where the f32 accuracy
    budget is re-validated (scripts/bench_protein.py measures both)."""
    cs = rate_cats * states
    w = coeff_lane_width(impl, states, rate_cats)
    per = max(1, 128 // w)

    def contract(coeff_ref, m, x):
        g, off = m // per, (m % per) * w
        if impl == "mxu":
            return mxu_dot(coeff_ref[g, :, off:off + w], x, dtype,
                           mxu_precision)
        acc = coeff_ref[g, :, off:off + 1] * x
        for d in range(1, states):
            shift = np.int32((cs - d * rate_cats) % cs)
            acc = acc + coeff_ref[g, :, off + d:off + d + 1] * pltpu.roll(
                x, shift, 0)
        return acc

    return contract


def gather_coeff(coeff: jax.Array, used: Sequence[int]) -> jax.Array:
    """Per-kernel matrix subset (keeps VMEM proportional to the segment,
    not the whole tree)."""
    return jnp.take(coeff, jnp.asarray(np.asarray(used, np.int32)), axis=0)


def pack_tips(tips_clv: jax.Array, impl: str) -> jax.Array:
    """[tips, C, S, L] -> [tips, C*S, L] in the row layout of ``impl``
    (rate-major for "mxu", state-major for "vpu").  Tips are constant after
    partition setup, so this runs once, not per sweep."""
    t, c, s, sites = tips_clv.shape
    if impl == "vpu":
        tips_clv = jnp.transpose(tips_clv, (0, 2, 1, 3))  # [tips, S, C, L]
    return tips_clv.reshape(t, c * s, sites)


def pad_sites_packed(packed: jax.Array, multiple: int = 128) -> jax.Array:
    """Pad the lane (site) axis of packed tip CLVs up to a multiple of the
    kernel block size with all-ones columns — the CLV of a gap tip, so the
    padding stays positive and bounded through the whole sweep (no NaNs,
    no scaling events from zero columns).  Lets the fused pipelines accept
    arbitrary site counts (in particular the ``states`` asc-bias
    pseudo-columns, `src/pll.c:490-495`, which make L = sites + S); callers
    slice results back to the real length.  Runs once at setup."""
    sites = packed.shape[-1]
    pad = -sites % multiple
    if not pad:
        return packed
    return jnp.concatenate(
        [packed, jnp.ones(packed.shape[:-1] + (pad,), packed.dtype)],
        axis=-1)


def unpack_clv(packed: jax.Array, rate_cats: int, states: int,
               impl: str) -> jax.Array:
    """Inverse of the packing for inner-CLV outputs: [..., C*S, L] ->
    [..., C, S, L]."""
    lead = packed.shape[:-2]
    sites = packed.shape[-1]
    if impl == "vpu":
        x = packed.reshape(*lead, states, rate_cats, sites)
        perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                          len(lead) + 2)
        return jnp.transpose(x, perm)
    return packed.reshape(*lead, rate_cats, states, sites)


def make_tip_term(tips_ref, tcoeff_ref, *, chars: bool, states: int,
                  dtype):
    """Roll-free pattern-tip term for the VPU path (see
    tip_coeff_pmatrices): one [C*S,1]x[1,bl] broadcast FMA per
    ambiguity-code bit.  ``tips_ref`` holds nibble words (chars) or one
    bitmask word per tip (masks)."""
    per_t = max(1, 128 // states)

    def tip_term(m, idx):
        if chars:
            word = tips_ref[pl.ds(idx // 8, 1), :]  # [1, bl] int32
            base = 4 * (idx % 8)
        else:
            word = tips_ref[pl.ds(idx, 1), :]
            base = 0
        g, off = m // per_t, (m % per_t) * states
        acc = None
        for d in range(states):
            bit = (jnp.right_shift(word, np.int32(base + d))
                   & 1).astype(dtype)
            part = tcoeff_ref[g, :, off + d:off + d + 1] * bit
            acc = part if acc is None else acc + part
        return acc

    return tip_term


def make_tipdecode(tips_ref, *, chars: bool, impl: str, states: int,
                   rate_cats: int, bl: int, dtype):
    """In-VMEM pattern-tip decode for the matmul (MXU) path: ambiguity
    code/bitmask -> 0/1 CLV rows (scalar shifts only; reference
    set_tipclv bit walk, pll.c:925-931)."""
    def tipdecode(idx):
        if chars:
            word = tips_ref[pl.ds(idx // 8, 1), :]  # [1, bl] int32
            code = (jnp.right_shift(word, np.int32(4 * (idx % 8)))
                    & 0xF)
        else:  # one bitmask word per tip (wide alphabets)
            code = tips_ref[pl.ds(idx, 1), :]
        if impl == "vpu":  # state-major rows s*C + c
            return jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.right_shift(code, np.int32(s)) & 1,
                    (rate_cats, bl)) for s in range(states)],
                axis=0).astype(dtype)
        block = jnp.concatenate(
            [jnp.right_shift(code, np.int32(s)) & 1
             for s in range(states)], axis=0)
        return jnp.concatenate([block] * rate_cats, axis=0).astype(dtype)

    return tipdecode


def _tip_slab_layout(tip_encoding: str, tips_packed, cs: int, tips: int,
                     pmatrix):
    """(chars, bitmasks, sites, dtype, tip_rows_eq) for a packed tip
    input under ``tip_encoding`` — tip_rows_eq is the slab footprint in
    [cs, bl]-row equivalents for the VMEM block chooser."""
    chars = tip_encoding == "chars"
    bitmasks = tip_encoding == "masks"
    if chars:
        words, sites = tips_packed.shape
        return True, False, sites, pmatrix.dtype, max(1, -(-words // cs))
    if bitmasks:
        _, sites = tips_packed.shape
        return False, True, sites, pmatrix.dtype, max(1, -(-tips // cs))
    _, cs_in, sites = tips_packed.shape
    assert cs_in == cs, (cs_in, cs)
    return False, False, sites, tips_packed.dtype, tips


def fused_sweep_supported(schedule: LevelSchedule, scale_mode: int,
                          rate_cats: int, states: int, sites: int,
                          itemsize: int = 4) -> bool:
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE, SCALE_PER_RATE):
        return False
    srows = rate_cats if scale_mode == SCALE_PER_RATE else 1
    n_nodes = schedule.tips + schedule.n_inner
    bl = _pick_block_sites(n_nodes, rate_cats * states, sites, itemsize,
                           (schedule.n_inner + 1) * srows)
    return bl is not None


def make_rate_mask(impl: str, states: int, rate_cats: int):
    """Per-rate all-below-threshold test for one [C*S, bl] block in the row
    layout of ``impl``: returns ``mask(x, thresh) -> (full, perr)`` with
    ``full`` [C*S, bl] bool (equal within each rate group) and ``perr``
    [C, bl] bool (one row per rate category, rate-major).

    vpu layout (state-major rows s*C+c): a cyclic sublane roll by k*C stays
    inside the rate group, so the group max is a max over S rolls and rows
    0..C-1 (s=0) hold one entry per rate.  mxu layout (rate-major rows
    c*S+s): static group-slice max.  Reference semantics:
    PLL_ATTRIB_RATE_SCALERS, `src/core_partials.c:633-644`.
    """
    def mask_vpu(x, thresh):
        m = x
        for k in range(1, states):
            m = jnp.maximum(m, pltpu.roll(x, np.int32(k * rate_cats), 0))
        full = m < thresh
        return full, full[0:rate_cats]

    def mask_mxu(x, thresh):
        bl = x.shape[-1]
        parts = [jnp.max(x[c * states:(c + 1) * states],
                         axis=0, keepdims=True)
                 for c in range(rate_cats)]
        perr = jnp.concatenate(parts, axis=0) < thresh  # [C, bl]
        full = jnp.concatenate(
            [jnp.broadcast_to(perr[c:c + 1], (states, bl))
             for c in range(rate_cats)], axis=0)
        return full, perr

    return mask_vpu if impl == "vpu" else mask_mxu


def make_rate_sum(impl: str, states: int, rate_cats: int):
    """Per-rate row sums of one [C*S, bl] block: ``rsum(y) -> [C, bl]``
    (rate-major rows), the in-kernel reduction needed before the per-rate
    scaler fold.  Same roll/slice duality as :func:`make_rate_mask`."""
    def sum_vpu(y):
        acc = y
        for k in range(1, states):
            acc = acc + pltpu.roll(y, np.int32(k * rate_cats), 0)
        return acc[0:rate_cats]

    def sum_mxu(y):
        return jnp.concatenate(
            [jnp.sum(y[c * states:(c + 1) * states], axis=0, keepdims=True)
             for c in range(rate_cats)], axis=0)

    return sum_vpu if impl == "vpu" else sum_mxu


def fold_rate_scalers_inkernel(term_r, snum, down):
    """In-kernel min/cap fold of per-rate scalers (reference
    `src/core_likelihood.c:916-941`): the per-site common part is the
    minimum over rates; the per-rate remainder, capped at
    SCALE_RATE_MAXDIFF, multiplies the per-rate term by ``down`` (the
    2**-shift downshift — i.e. the scaling *threshold*, an exact power of
    two) that many times.  term_r/snum: [C, bl].
    Returns (folded term_r, site minimum [1, bl])."""
    from ..utils.constants import SCALE_RATE_MAXDIFF

    site = jnp.min(snum, axis=0, keepdims=True)
    diff = jnp.minimum(snum - site, SCALE_RATE_MAXDIFF)
    for k in range(1, SCALE_RATE_MAXDIFF + 1):
        term_r = jnp.where(diff >= k, term_r * down, term_r)
    return term_r, site


def pack_weight_vec(freqs_pc: jax.Array, rate_weights: jax.Array,
                    impl: str) -> jax.Array:
    """[C, S] frequencies × [C] rate weights -> [C*S, 1] combined weight
    column in the packed row layout of ``impl``.  Used by the fused edge
    score: Σ_c w_c Σ_s f_cs·x_cs == sum over all packed rows of (wvec ⊙ x)."""
    wf = freqs_pc * rate_weights[:, None]  # [C, S]
    if impl == "vpu":
        wf = wf.T  # state-major rows
    return wf.reshape(-1, 1)


def sum_block_partials(partials: jax.Array) -> jax.Array:
    """Reduce per-site-block partial log-likelihood sums to the total.

    In float32 the *global* site reduction is the accuracy bottleneck:
    |logL| reaches 1e6-1e7 at flagship scale, where one f32 ulp is ~0.1-1
    logL units, so a running f32 accumulator loses ~ulp × #blocks.  The
    score kernels therefore emit one partial per 128-site block and this
    fold runs at float64 when x64 is enabled (a few thousand scalar adds —
    free even under TPU f64 emulation).  Without x64 it falls back to the
    f32 pairwise sum (error ~log2(#blocks) ulps, the representational
    limit of an f32 result anyway)."""

    if jax.config.jax_enable_x64 and partials.dtype != jnp.float64:
        return jnp.sum(partials.astype(jnp.float64))
    return jnp.sum(partials)


def pack_tipchars(tip_masks) -> jax.Array:
    """[tips, L] 4-bit ambiguity codes -> nibble-packed [ceil(tips/8), L]
    int32 words (word row g holds tips 8g..8g+7) for the fused score's
    tip_encoding="chars" mode — 0.5 byte/tip/site, the reference's
    PLL_ATTRIB_PATTERN_TIP storage (src/pll.c:825-903) decoded in VMEM."""
    masks = np.asarray(tip_masks, dtype=np.uint32)
    if masks.max() > 0xF:
        raise ValueError("tipchars mode supports 4-bit codes (states<=4)")
    tips, sites = masks.shape
    words = -(-tips // 8)
    slab = np.zeros((words * 8, sites), np.uint32)
    slab[:tips] = masks
    packed = np.zeros((words, sites), np.uint32)
    for k in range(8):
        packed |= slab[k::8][:words] << np.uint32(4 * k)
    return jnp.asarray(packed.astype(np.int32))


def make_fused_edge_score(schedule: LevelSchedule, parent_clv: int,
                          child_clv: int, edge_matrix: int,
                          scale_mode: int = SCALE_PER_SITE, *,
                          impl: str = "auto", rate_cats: int, states: int,
                          block_sites: Optional[int] = None,
                          use_pinv: bool = False,
                          tip_encoding: str = "clv",
                          mxu_precision: str = "highest",
                          interpret: bool = False):
    """Build ``score(tips_packed, pmatrix, weight_vec, pattern_weights
    [, inv_add]) -> logl`` — the tree-search scoring primitive.

    Runs the whole pruning sweep with inner CLVs as VMEM *scratch* (never
    written to HBM) and folds the edge log-likelihood reduction into the
    kernel: per site block the only HBM traffic is the tip stream in and one
    partial-sum scalar out, roughly halving the traffic of sweep-then-score.

    Proportion-of-invariant mixing (``use_pinv``) enters linearly, exactly
    as the reference orders it (`src/core_likelihood.c:966-978`: per-rate
    fold first, invariant likelihood unscaled):
    ``Σ_c w_c[(1-p_c)·term_c + p_c·f_c[inv]] = Σ_rows(y·wvec') + inv_add``
    with ``(1-p_c)`` folded into ``weight_vec`` by the caller and
    ``inv_add`` a per-site [1, L] additive input.  Ascertainment bias is
    deliberately *not* in-kernel: its S pseudo-columns cost one tiny XLA
    side-sweep (engine/evaluate.make_asc_tail), which composes with every
    score kernel.

    Scope otherwise: per-site or no scaling — the standard GTR(+Γ[+I])
    tree-search configuration.  ``weight_vec`` is :func:`pack_weight_vec`;
    ``pattern_weights`` is [1, L] in the working dtype.  Matches
    `pll_core_edge_loglikelihood_ii` semantics (libpll
    `src/core_likelihood.c:727-941`) for that scope.
    """
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE):
        raise ValueError("fused edge score: per-site or no scaling only")
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"

    tips, n_inner = schedule.tips, schedule.n_inner
    dummy = n_inner
    ops = _flatten_ops(schedule)
    cs = rate_cats * states
    if parent_clv < tips:
        raise ValueError("evaluation-edge parent must be an inner node")

    def srow(clv_idx):
        return clv_idx - tips if clv_idx >= tips else dummy

    sp, sc = srow(parent_clv), srow(child_clv)

    chars = tip_encoding == "chars"
    bitmasks = tip_encoding == "masks"
    if tip_encoding not in ("clv", "chars", "masks"):
        raise ValueError(f"unknown tip encoding {tip_encoding!r}")
    if chars and states > 4:
        # a nibble holds 4 state bits; the roll-free tip term reads bit
        # base+d without re-masking, which would cross into the next
        # tip's nibble for d >= 4
        raise ValueError("tip_encoding='chars' requires states <= 4; "
                         "use 'masks' for wider alphabets")

    def score(tips_packed, pmatrix, weight_vec, pattern_weights,
              inv_add=None):
        assert (inv_add is not None) == use_pinv
        _, _, sites, dtype, tip_rows_eq = _tip_slab_layout(
            tip_encoding, tips_packed, cs, tips, pmatrix)
        thresh, factor = _scale_consts(dtype)
        itemsize = np.dtype(dtype).itemsize
        log_scale = np.asarray(
            -scale_shift_bits(dtype) * np.log(2.0), dtype)

        bl = block_sites or _pick_block_sites(
            tip_rows_eq + n_inner, cs, sites, itemsize, n_inner + 1)
        if bl is None or sites % bl != 0:
            raise ValueError("no viable site block; use the XLA path")

        coeff = (block_diag_pmatrices(pmatrix) if impl == "mxu"
                 else roll_coeff_pmatrices(pmatrix))
        coeff = lane_pack_coeff(
            coeff, coeff_lane_width(impl, states, rate_cats))
        # roll-free tip terms pay off on the VPU path (they eliminate the
        # sublane rolls); the MXU path keeps decode + block-diag matmul —
        # S per-bit broadcast FMA temporaries at wide S blow the scoped
        # VMEM stack and the matmul amortizes tips anyway.
        pattern_tips = (chars or bitmasks) and impl == "vpu"
        if pattern_tips:
            tcoeff = lane_pack_coeff(tip_coeff_pmatrices(pmatrix, impl),
                                     states)
        n_blocks = sites // bl

        contract = make_contract(impl, states, rate_cats, dtype,
                                 mxu_precision)

        def kernel(tips_ref, coeff_ref, *rest):
            if pattern_tips:
                tcoeff_ref, wvec_ref, pw_ref, *rest = rest
            else:
                wvec_ref, pw_ref, *rest = rest
            if use_pinv:
                inv_ref, out_ref, inner_ref, scaler_ref = rest
            else:
                out_ref, inner_ref, scaler_ref = rest

            if pattern_tips:
                tip_term = make_tip_term(tips_ref, tcoeff_ref,
                                         chars=chars, states=states,
                                         dtype=dtype)
            if chars or bitmasks:
                tipdecode = make_tipdecode(tips_ref, chars=chars,
                                           impl=impl, states=states,
                                           rate_cats=rate_cats, bl=bl,
                                           dtype=dtype)

            def child(idx):
                if idx >= tips:
                    return inner_ref[idx - tips]
                return (tipdecode(idx) if (chars or bitmasks)
                        else tips_ref[idx])

            def term(m, idx):
                if pattern_tips and idx < tips:
                    return tip_term(m, idx)
                return contract(coeff_ref, m, child(idx))

            def scaler_rows(row):
                if row == dummy:
                    return jnp.zeros((1, bl), jnp.int32)
                return scaler_ref[row:row + 1, :]

            one = jnp.ones((), dtype)
            scaler_ref[dummy:dummy + 1, :] = jnp.zeros((1, bl), jnp.int32)
            for (prow, c1, m1, c2, m2, s1, s2, has) in ops:
                x = term(m1, c1) * term(m2, c2)
                cnt = scaler_rows(s1) + scaler_rows(s2)
                if scale_mode == SCALE_PER_SITE and has:
                    mask = jnp.max(x, axis=0, keepdims=True) < thresh
                    # broadcast-multiply by a [1,bl] factor row instead of a
                    # full-tile select: bit-identical (factor is an exact
                    # power of two and x*1 == x for x >= 0), one fewer
                    # full-tile op per scaled node
                    x = x * jnp.where(mask, factor, one)
                    cnt = cnt + mask.astype(jnp.int32)
                inner_ref[prow] = x
                scaler_ref[prow:prow + 1, :] = cnt

            termb = term(edge_matrix, child_clv)
            y = child(parent_clv) * termb * wvec_ref[...]
            site_term = jnp.sum(y, axis=0, keepdims=True)  # [1, bl]
            if use_pinv:
                site_term = site_term + inv_ref[...]
            snum = scaler_rows(sp) + scaler_rows(sc)
            lnl = (jnp.log(site_term)
                   + snum.astype(dtype) * log_scale) * pw_ref[...]
            # per-block partial sum; the f32-accuracy-critical global
            # reduction happens outside the kernel (f64 when enabled)
            out_ref[0, pl.program_id(0)] = jnp.sum(lnl)

        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",))
        except TypeError:  # pragma: no cover
            compiler_params = None

        z = np.int32(0)
        nd = len(coeff.shape)
        tip_spec = (pl.BlockSpec((tips_packed.shape[0], bl),
                                 lambda j: (z, j), memory_space=pltpu.VMEM)
                    if (chars or bitmasks) else
                    pl.BlockSpec((tips, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM))
        in_specs = [
            tip_spec,
            pl.BlockSpec(coeff.shape, lambda j: (z,) * nd,
                         memory_space=pltpu.VMEM),
        ]
        args = [tips_packed, coeff]
        if pattern_tips:
            in_specs.append(pl.BlockSpec(tcoeff.shape, lambda j: (z, z, z),
                                         memory_space=pltpu.VMEM))
            args.append(tcoeff)
        in_specs += [
            pl.BlockSpec((cs, 1), lambda j: (z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl), lambda j: (z, j),
                         memory_space=pltpu.VMEM),
        ]
        args += [weight_vec, pattern_weights]
        if use_pinv:
            in_specs.append(pl.BlockSpec((1, bl), lambda j: (z, j),
                                         memory_space=pltpu.VMEM))
            args.append(inv_add)
        partials = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, n_blocks), lambda j: (z, z),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_blocks), dtype),
            scratch_shapes=[
                pltpu.VMEM((n_inner, cs, bl), dtype),
                pltpu.VMEM((n_inner + 1, bl), jnp.int32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(*args)

        return sum_block_partials(partials[0, :])

    return score


def make_fused_sweep(schedule: LevelSchedule, scale_mode: int = SCALE_PER_SITE,
                     *, impl: str = "auto", rate_cats: int, states: int,
                     block_sites: Optional[int] = None,
                     tip_encoding: str = "clv",
                     mxu_precision: str = "highest",
                     interpret: bool = False):
    """Build ``sweep(tips_packed, pmatrix) -> (inner_packed, scalers)``.

    tips_packed: [tips, C*S, L] from :func:`pack_tips` (constant after
    setup — tips are pure inputs).  pmatrix: [M, C, S, S].
    Returns inner CLVs [n_inner, C*S, L] in the same packed layout (see
    :func:`unpack_clv`) and per-site scalers [n_inner + 1, L] int32 (last
    row the always-zero dummy), matching the level-major row convention of
    ops/sweep.py.

    ``tip_encoding="chars"`` / ``"masks"`` accept pattern tips instead of
    full CLVs — nibble-packed [ceil(tips/8), L] int32 words from
    :func:`pack_tipchars` (DNA, 0.5 byte/tip/site) or one ambiguity
    bitmask word per tip (wide alphabets) — decoded in VMEM exactly as in
    the fused edge score (the reference's PLL_ATTRIB_PATTERN_TIP storage,
    `src/pll.c:825-903`, for the all-CLVs-out sweep): the dominant tip
    CLV input stream drops ~32x and the VMEM slab shrinks, admitting
    larger site blocks.  On the VPU path tip children use the roll-free
    bit-product term; their f32 inner CLVs can differ from the "clv"
    encoding in the last ulp (different summation order), scalers are
    bit-identical.

    impl="mxu": block-diagonal [C·S, C·S] matmul per child (bit-identical
    accumulation to the XLA einsum path).  impl="vpu": S cyclic sublane
    rolls + FMAs in state-major layout — faster for small state counts
    where a K=C·S matmul underutilizes the MXU.  "auto" picks vpu for
    DNA-sized states, mxu otherwise.

    scale_mode=SCALE_PER_RATE (the reference's PLL_ATTRIB_RATE_SCALERS)
    keeps one counter per (site, rate); the returned scalers are then
    [n_inner + 1, C, L] int32.  The per-rate all-below-threshold test is a
    cyclic roll-max within each rate group (vpu layout) or a static
    group-slice max (mxu layout).
    """
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE, SCALE_PER_RATE):
        raise ValueError(f"unsupported scale mode {scale_mode}")
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    if impl not in ("mxu", "vpu"):
        raise ValueError(f"unknown impl {impl!r}")
    per_rate = scale_mode == SCALE_PER_RATE
    if tip_encoding not in ("clv", "chars", "masks"):
        raise ValueError(f"unknown tip encoding {tip_encoding!r}")
    if tip_encoding == "chars" and states > 4:
        raise ValueError("tip_encoding='chars' requires states <= 4; "
                         "use 'masks' for wider alphabets")

    tips, n_inner = schedule.tips, schedule.n_inner
    dummy = n_inner
    ops = _flatten_ops(schedule)
    cs = rate_cats * states

    def sweep(tips_packed, pmatrix):
        chars, bitmasks, sites, dtype, tip_rows_eq = _tip_slab_layout(
            tip_encoding, tips_packed, cs, tips, pmatrix)
        thresh, factor = _scale_consts(dtype)
        itemsize = np.dtype(dtype).itemsize

        bl = block_sites or _pick_block_sites(
            tip_rows_eq + n_inner, cs, sites, itemsize,
            (n_inner + 1) * (rate_cats if per_rate else 1))
        if bl is None or sites % bl != 0:
            raise ValueError(
                f"no viable site block for {tip_rows_eq + n_inner} nodes "
                f"x {cs} x {sites} sites; use the XLA sweep")

        coeff = (block_diag_pmatrices(pmatrix) if impl == "mxu"
                 else roll_coeff_pmatrices(pmatrix))
        coeff = lane_pack_coeff(
            coeff, coeff_lane_width(impl, states, rate_cats))
        coeff_block = coeff.shape
        pattern_tips = (chars or bitmasks) and impl == "vpu"
        if pattern_tips:
            tcoeff = lane_pack_coeff(tip_coeff_pmatrices(pmatrix, impl),
                                     states)
        n_blocks = sites // bl

        contract = make_contract(impl, states, rate_cats, dtype,
                                 mxu_precision)
        srows = rate_cats if per_rate else 1  # scaler rows per node
        rate_mask_fn = make_rate_mask(impl, states, rate_cats)

        def kernel(tips_ref, coeff_ref, *rest):
            if pattern_tips:
                tcoeff_ref, inner_ref, scaler_ref = rest
                tip_term = make_tip_term(tips_ref, tcoeff_ref,
                                         chars=chars, states=states,
                                         dtype=dtype)
            else:
                inner_ref, scaler_ref = rest
            if chars or bitmasks:
                tipdecode = make_tipdecode(tips_ref, chars=chars,
                                           impl=impl, states=states,
                                           rate_cats=rate_cats, bl=bl,
                                           dtype=dtype)

            def child(idx):
                if idx >= tips:
                    return inner_ref[idx - tips]
                return (tipdecode(idx) if (chars or bitmasks)
                        else tips_ref[idx])

            def term(m, idx):
                if pattern_tips and idx < tips:
                    return tip_term(m, idx)
                return contract(coeff_ref, m, child(idx))

            def scaler_rows(row):
                if row == dummy:
                    return jnp.zeros((srows, bl), jnp.int32)
                return scaler_ref[row * srows:(row + 1) * srows, :]

            scaler_ref[dummy * srows:(dummy + 1) * srows, :] = (
                jnp.zeros((srows, bl), jnp.int32))
            for (prow, c1, m1, c2, m2, s1, s2, has) in ops:
                x = term(m1, c1) * term(m2, c2)
                cnt = scaler_rows(s1) + scaler_rows(s2)
                if scale_mode == SCALE_PER_SITE and has:
                    # all(x < t) == max(x) < t, as a native f32 reduction
                    # (Mosaic cannot lower the bool all-reduce)
                    mask = jnp.max(x, axis=0, keepdims=True) < thresh
                    # [1,bl] factor row broadcast-multiply instead of a full-tile
                    # select: bit-identical (factor is an exact power of
                    # two; x*1 == x for x >= 0), one fewer full-tile op
                    x = x * jnp.where(mask, factor, jnp.ones((), dtype))
                    cnt = cnt + mask.astype(jnp.int32)
                elif per_rate and has:
                    full, perr = rate_mask_fn(x, thresh)
                    x = jnp.where(full, x * factor, x)
                    cnt = cnt + perr.astype(jnp.int32)
                inner_ref[prow] = x
                scaler_ref[prow * srows:(prow + 1) * srows, :] = cnt

        flops = 2 * len(ops) * 2 * cs * cs * sites
        bytes_accessed = ((tip_rows_eq + n_inner) * cs * sites * itemsize
                          + (n_inner + 1) * sites * 4)

        try:
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("arbitrary",))
        except TypeError:  # pragma: no cover - older/newer JAX field names
            compiler_params = None

        # int32 constants in index maps: Mosaic rejects the i64 literals that
        # Python ints become under jax_enable_x64
        z = np.int32(0)
        nd = len(coeff_block)
        tip_spec = (pl.BlockSpec((tips_packed.shape[0], bl),
                                 lambda j: (z, j), memory_space=pltpu.VMEM)
                    if (chars or bitmasks) else
                    pl.BlockSpec((tips, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM))
        in_specs = [
            tip_spec,
            pl.BlockSpec(coeff_block, lambda j: (z,) * nd,
                         memory_space=pltpu.VMEM),
        ]
        args = [tips_packed, coeff]
        if pattern_tips:
            in_specs.append(pl.BlockSpec(tcoeff.shape, lambda j: (z, z, z),
                                         memory_space=pltpu.VMEM))
            args.append(tcoeff)
        inner2d, scalers = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((n_inner, cs, bl), lambda j: (z, z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(((n_inner + 1) * srows, bl),
                             lambda j: (z, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_inner, cs, sites), dtype),
                jax.ShapeDtypeStruct(((n_inner + 1) * srows, sites),
                                     jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=bytes_accessed,
                transcendentals=0),
            compiler_params=compiler_params,
            interpret=interpret,
        )(*args)

        if per_rate:
            scalers = scalers.reshape(n_inner + 1, rate_cats, sites)
        return inner2d, scalers

    return sweep
