"""Data-driven fused sweep — constant trace/compile cost at any tree size.

The unrolled kernels in ops/clv_pallas.py / clv_pallas_seg.py bake the op
schedule into the kernel body, so Python tracing grows linearly with the
tree (~2 min at 4k taxa).  This module moves the schedule into **data**:

  * the op table is a scalar-prefetched int32 array read from SMEM;
  * the kernel body is a fixed CHUNK-op unrolled loop using *dynamic row
    indices* into one combined VMEM ``state`` scratch (tips | imports |
    locals | trash);
  * per-op transition matrices are pre-gathered into op order and
    lane-packed so each op's coefficients sit at a *static* lane offset of
    its chunk tile (no dynamic lane slicing);
  * every segment of a large tree is padded to one uniform shape, so all
    segments execute the **same compiled kernel** with different tables.

Semantics are identical to the unrolled kernels (same scaling counters,
same contraction order per impl); tests cross-validate all three.

Grid: (site_blocks, chunks) with chunks innermost; the state scratch
persists across chunk steps of one site block and is re-initialized from
the pipelined tip/import inputs at chunk 0.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import (SCALE_NONE, SCALE_PER_RATE, SCALE_PER_SITE,
                               scale_shift_bits)
from .clv import _scale_consts
from .clv_pallas import (_VMEM_BUDGET, block_diag_pmatrices,
                         fold_rate_scalers_inkernel, make_rate_mask,
                         make_rate_sum, mxu_dot, roll_coeff_pmatrices)
from .clv_pallas_seg import SegmentedSchedule, build_segmented_schedule

CHUNK = 64  # ops per grid step (the unrolled kernel body size)

# JAX tracing of the chunked kernels recurses in Python proportionally to
# jaxpr size; the default 1000-frame limit trips on large-tree schedules.
import sys as _sys
_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 200000))


@dataclass(frozen=True)
class DynSegment:
    table: np.ndarray        # [n_ops_pad, 6] int32: p_state, c1, c2, s1, s2, has
    m_ops: np.ndarray        # [n_ops_pad, 2] int32 matrix ids (op order)
    tip_globals: np.ndarray  # [n_tips_used] int64 global tip rows
    imports: Tuple[Tuple[int, int], ...]  # (segment, local) refs
    n_local: int             # real (unpadded) local count


@dataclass(frozen=True)
class DynSchedule:
    segments: Tuple[DynSegment, ...]
    tips: int
    n_inner: int
    r_tip: int      # uniform tip-slab rows
    r_imp: int      # uniform import rows
    r_loc: int      # uniform (padded) local rows = n_chunks*chunk
    n_chunks: int
    chunk: int      # ops per grid step (kernel body size)
    seg_offsets: Tuple[int, ...]  # segment-major inner row offsets
    loc_of: dict    # level-major inner row -> (segment, local)
    min_r_exp: int = 0  # export-table row floor (table-swap envelopes)

    def inner_row(self, level_major_inner_row: int) -> int:
        s, l = self.loc_of[level_major_inner_row]
        return self.seg_offsets[s] + l

    scaler_row = inner_row


def _dyn_max_rows(cs: int, itemsize: int, bl: int) -> int:
    # state scratch + double-buffered inputs + chunk outputs + scalers
    per_row = (cs * bl * itemsize) * 3 + bl * 4 * 3
    return max(16, (_VMEM_BUDGET - 2 * CHUNK * cs * bl * itemsize)
               // per_row)


def _pick_chunk(states: int, rate_cats: int, block_sites: int = 128,
                itemsize: int = 4) -> int:
    """Ops per unrolled kernel chunk, sized so the chunk's live roll/FMA
    temporaries (~states · C·S · block · itemsize each) fit Mosaic's
    scoped-VMEM stack: 64 for DNA-sized alphabets, ~16-20 for protein."""
    budget = 8 * 1024 * 1024
    per_op = states * states * rate_cats * block_sites * itemsize
    return int(max(8, min(CHUNK, budget // per_op)))


def build_dyn_schedule(schedule, *, rate_cats: int, states: int,
                       itemsize: int = 4, block_sites: int = 128,
                       max_rows: Optional[int] = None,
                       chunk: Optional[int] = None,
                       ensure_rows: Sequence[int] = (),
                       min_r_tip: int = 0, min_r_imp: int = 0,
                       min_r_loc: int = 0, min_segments: int = 0,
                       min_r_exp: int = 0) -> DynSchedule:
    """Segment (via clv_pallas_seg) and pad to one uniform kernel shape.

    The ``min_*`` floors pin the padded envelope across topologies: two
    trees built with the same floors (large enough for both) produce
    schedules whose kernels share every compiled shape, so a topology move
    is a pure table swap (see :func:`dyn_swap_args`).  ``min_segments``
    pads with inert all-trash segments *before* the final (root) segment.
    """
    cs = rate_cats * states
    if chunk is None:
        chunk = _pick_chunk(states, rate_cats, block_sites, itemsize)
    if max_rows is None:
        max_rows = _dyn_max_rows(cs, itemsize, block_sites)
    seg = build_segmented_schedule(schedule, rate_cats=rate_cats,
                                   states=states, itemsize=itemsize,
                                   max_rows=max_rows,
                                   ensure_rows=ensure_rows)
    tips, n_inner = seg.tips, seg.n_inner
    r_tip = max(max(len(s.tip_globals) for s in seg.segments), 1, min_r_tip)
    r_imp = max(max(len(s.imports) for s in seg.segments), 1, min_r_imp)
    r_loc_real = max(max(s.n_local for s in seg.segments), min_r_loc)
    n_chunks = -(-r_loc_real // chunk)
    r_loc = n_chunks * chunk

    # state scratch rows: [0,r_tip) tips | [r_tip,+r_imp) imports |
    # [+,+r_loc) locals | trash (last)
    loc0 = r_tip + r_imp
    trash_state = loc0 + r_loc
    # scaler scratch rows: [0,r_imp) import counters | [r_imp,+r_loc)
    # locals | dummy (zero) | trash
    sloc0 = r_imp
    dummy_scal = sloc0 + r_loc
    trash_scal = dummy_scal + 1

    def s_state(src):
        kind, i = src[0], (src[1] if len(src) > 1 else 0)
        if kind == "tip":
            return i
        if kind == "imp":
            return r_tip + i
        return loc0 + i

    def s_scal(src):
        if src[0] == "zero":
            return dummy_scal
        if src[0] == "simp":
            return src[1]
        return sloc0 + src[1]

    def pad_table():
        table = np.zeros((r_loc, 6), np.int32)
        m_ops = np.zeros((r_loc, 2), np.int32)
        # pad entries: read/write trash rows, never scale
        table[:, 0] = trash_state
        table[:, 1] = trash_state
        table[:, 2] = trash_state
        table[:, 3] = trash_scal
        table[:, 4] = trash_scal
        return table, m_ops

    dsegs: List[DynSegment] = []
    offsets: List[int] = []
    acc = 0
    for s in seg.segments:
        table, m_ops = pad_table()
        for (lp, src1, m1, src2, m2, sr1, sr2, has) in s.ops:
            table[lp] = (loc0 + lp, s_state(src1), s_state(src2),
                         s_scal(sr1), s_scal(sr2), int(has))
            m_ops[lp] = (m1, m2)
        dsegs.append(DynSegment(table, m_ops,
                                np.asarray(s.tip_globals, np.int64),
                                tuple(s.imports), s.n_local))
        offsets.append(acc)
        acc += s.n_local
    assert acc == n_inner

    loc_of = dict(seg.loc_of)
    n_pad_segs = min_segments - len(dsegs)
    if n_pad_segs > 0:
        # inert segments go just before the final (root) segment: only the
        # root's own index shifts; imports always reference earlier (leaf)
        # segments, whose indices are unchanged
        old_last = len(dsegs) - 1
        pads = [DynSegment(*pad_table(), np.zeros(0, np.int64), (), 0)
                for _ in range(n_pad_segs)]
        dsegs[old_last:old_last] = pads
        offsets[old_last:old_last] = [offsets[old_last]] * n_pad_segs
        loc_of = {k: ((old_last + n_pad_segs, l) if s == old_last
                      else (s, l))
                  for k, (s, l) in loc_of.items()}

    return DynSchedule(tuple(dsegs), tips, n_inner, r_tip, r_imp, r_loc,
                       n_chunks, chunk, tuple(offsets), loc_of,
                       min_r_exp)


def pack_tips_dyn(tips_clv: jax.Array, dyn: DynSchedule,
                  impl: str = "vpu") -> List[jax.Array]:
    """Per-segment packed tip slabs, padded to the uniform r_tip rows."""
    from .clv_pallas import pack_tips

    packed = pack_tips(tips_clv, impl)
    cs, sites = packed.shape[1], packed.shape[2]
    out = []
    for s in dyn.segments:
        if s.tip_globals.size:
            slab = jnp.take(packed, jnp.asarray(s.tip_globals), axis=0)
        else:
            slab = jnp.zeros((0, cs, sites), packed.dtype)
        pad = dyn.r_tip - slab.shape[0]
        if pad:
            slab = jnp.concatenate(
                [slab, jnp.zeros((pad, cs, sites), packed.dtype)], axis=0)
        out.append(slab)
    return out


def pack_tipmasks_dyn(tip_masks: np.ndarray, dyn: DynSchedule
                      ) -> List[jax.Array]:
    """Per-segment tip slabs as one int32 ambiguity-bitmask word per
    (tip, site): [r_tip, L] (tip_encoding="masks").  The wide-alphabet
    pattern-tip mode — protein tips are 20-bit masks (pll_map_aa), so the
    nibble-packed chars mode cannot hold them; one word is still an 80×
    residency cut vs the [C=4, S=20] f32 tip CLV.  Reference pattern-tip
    semantics: `src/pll.c:825-903` with the tipmap indirection replaced by
    in-VMEM bit decode."""
    masks = np.asarray(tip_masks, dtype=np.uint32)
    if masks.max() > 0x7FFFFFFF:
        raise ValueError("tip masks must fit 31 bits (states <= 31)")
    sites = masks.shape[1]
    out = []
    for s in dyn.segments:
        slab = np.zeros((dyn.r_tip, sites), np.uint32)
        if s.tip_globals.size:
            slab[:len(s.tip_globals)] = masks[s.tip_globals]
        out.append(jnp.asarray(slab.astype(np.int32)))
    return out


def pack_tipchars_dyn(tip_masks: np.ndarray, dyn: DynSchedule
                      ) -> List[jax.Array]:
    """Per-segment tip slabs as nibble-packed int32 words
    [ceil(r_tip/8), L]: word row g holds the 4-bit IUPAC ambiguity codes of
    tips 8g..8g+7 (pattern-tip mode; source: Partition._tip_masks /
    encode_sequence).  0.5 byte/tip/site — a 10k-taxa × 1M-site tip set is
    ~5 GB HBM.  (int32 because Mosaic cannot lower int8→int32 converts.)"""
    masks = np.asarray(tip_masks, dtype=np.uint32)
    if masks.max() > 0xF:
        raise ValueError("tipchars mode supports 4-bit codes (states<=4)")
    sites = masks.shape[1]
    words = -(-dyn.r_tip // 8)
    out = []
    for s in dyn.segments:
        slab = np.zeros((words * 8, sites), np.uint32)
        if s.tip_globals.size:
            slab[:len(s.tip_globals)] = masks[s.tip_globals]
        packed = np.zeros((words, sites), np.uint32)
        for k in range(8):
            packed |= slab[k::8][:words] << np.uint32(4 * k)
        out.append(jnp.asarray(packed.astype(np.int32)))
    return out


_TIP_ENCODINGS = ("clv", "chars", "masks")


def _tip_blockspec(tip_encoding, r_tip, cs, bl, n_prefetch):
    """BlockSpec of the per-segment tip slab input for each encoding;
    ``n_prefetch`` is the kernel's scalar-prefetch arg count (grid is
    always (site_blocks, chunks))."""
    z = np.int32(0)
    m2 = {1: lambda j, c, t: (z, j),
          2: lambda j, c, t, e: (z, j)}[n_prefetch]
    m3 = {1: lambda j, c, t: (z, z, j),
          2: lambda j, c, t, e: (z, z, j)}[n_prefetch]
    if tip_encoding == "chars":
        return pl.BlockSpec((-(-r_tip // 8), bl), m2,
                            memory_space=pltpu.VMEM)
    if tip_encoding == "masks":
        return pl.BlockSpec((r_tip, bl), m2, memory_space=pltpu.VMEM)
    return pl.BlockSpec((r_tip, cs, bl), m3, memory_space=pltpu.VMEM)


def _make_tip_decoder(tip_encoding, r_tip, rate_cats, states,
                      impl: str = "vpu"):
    """In-VMEM decode of a segment's tip slab into 0/1 CLV state rows
    (state-major rows for the vpu-roll contraction, rate-major for mxu;
    reference set_tipclv bit walk, pll.c:925-931).  Scalar shifts only:
    Mosaic's vector-shift-by-vector lowering recurses under x64."""
    def bits_of(word, dtype):
        bl_ = word.shape[-1]
        if impl == "vpu":  # row s*C + c
            return jnp.concatenate(
                [jnp.broadcast_to(jnp.right_shift(word, np.int32(s)) & 1,
                                  (rate_cats, bl_)) for s in range(states)],
                axis=0).astype(dtype)
        block = jnp.concatenate(  # row c*S + s
            [jnp.right_shift(word, np.int32(s)) & 1 for s in range(states)],
            axis=0)
        return jnp.concatenate([block] * rate_cats, axis=0).astype(dtype)

    if tip_encoding == "clv":
        def decode(tips_ref, state, dtype):
            state[0:r_tip] = tips_ref[...]
    elif tip_encoding == "chars":
        # nibble-packed 4-bit codes, 8 tips per int32 word
        def decode(tips_ref, state, dtype):
            for ti in range(r_tip):
                word = tips_ref[pl.ds(ti // 8, 1), :]
                code = jnp.right_shift(word, np.int32(4 * (ti % 8))) & 0xF
                state[ti] = bits_of(code, dtype)
    else:  # masks: one bitmask word per tip row (wide alphabets)
        def decode(tips_ref, state, dtype):
            for ti in range(r_tip):
                state[ti] = bits_of(tips_ref[pl.ds(ti, 1), :], dtype)
    return decode


def _coeff_lanes(w: int) -> int:
    """Lane width of one coefficient tile: 128, or the next 128-multiple
    that holds one op's two w-wide tables (mxu wide-state case)."""
    return max(128, -(-2 * w // 128) * 128)


def _pack_op_coeff(coeff_ops: jax.Array, w: int, chunk: int
                   ) -> Tuple[jax.Array, int]:
    """[n_ops_pad, 2, cs, w] op-ordered coefficient tables (roll tables
    for vpu, block-diag matrices for mxu) -> lane-packed tiles
    [n_chunks*tiles_per_chunk, cs, lanes]; within a chunk, op k occupies
    lanes [(k % per)·2w, +2w) of the chunk's tile k // per (left side
    first).  Packing is per-chunk so tile addressing stays aligned for any
    chunk size."""
    n_ops, _, cs, w_ = coeff_ops.shape
    assert w_ == w and n_ops % chunk == 0
    lanes = _coeff_lanes(w)
    per = lanes // (2 * w)
    tiles_per_chunk = -(-chunk // per)
    n_chunks = n_ops // chunk
    pad = tiles_per_chunk * per - chunk  # in-chunk padding
    x = coeff_ops.reshape(n_chunks, chunk, 2, cs, w)
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((n_chunks, pad, 2, cs, w), x.dtype)], axis=1)
    x = x.reshape(n_chunks * tiles_per_chunk, per, 2, cs, w)
    x = x.transpose(0, 3, 1, 2, 4).reshape(
        n_chunks * tiles_per_chunk, cs, per * 2 * w)
    lane_pad = lanes - per * 2 * w
    if lane_pad:
        x = jnp.concatenate(
            [x, jnp.zeros((x.shape[0], cs, lane_pad), x.dtype)], axis=2)
    return x, per


def _dyn_contract(impl: str, states: int, rate_cats: int, w: int,
                  mxu_precision: str = "highest"):
    """In-kernel child contraction at a static lane offset of a chunk
    coefficient tile: vpu cyclic-roll FMAs or one [cs, cs] @ [cs, bl]
    MXU matmul (block-diagonal table).  ``mxu_precision``: see
    clv_pallas.make_contract ("high" = bf16x3, ~2x MXU time on the
    protein path; default f32-exact)."""
    cs = rate_cats * states

    def contract(coeff_ref, tile, off, x, dtype):
        if impl == "mxu":
            return mxu_dot(coeff_ref[tile, :, off:off + w], x, dtype,
                              mxu_precision)
        acc = coeff_ref[tile, :, off:off + 1] * x
        for d in range(1, w):
            shift = np.int32((cs - d * rate_cats) % cs)
            acc = acc + (coeff_ref[tile, :, off + d:off + d + 1]
                         * pltpu.roll(x, shift, 0))
        return acc

    return contract


def make_dyn_sweep(dyn: DynSchedule, scale_mode: int = SCALE_PER_SITE, *,
                   rate_cats: int, states: int, block_sites: int = 128,
                   tip_encoding: str = "clv", impl: str = "auto",
                   mxu_precision: str = "highest",
                   interpret: bool = False):
    """Build ``sweep(tip_slabs, tables, m_gathers, pmatrix) -> (inner,
    scalers)`` where ``tables``/``m_gathers`` come from
    :func:`dyn_runtime_args` — all segments run one compiled kernel.

    tip_encoding="chars" is the rebuild's PLL_ATTRIB_PATTERN_TIP
    (reference `src/pll.c:825-903`): tip slabs are nibble-packed 4-bit
    ambiguity codes (from :func:`pack_tipchars_dyn`), decoded to 0/1
    CLV rows in VMEM with bit-shifts — tip HBM traffic and residency drop
    by 4·C·S bytes -> 0.5 per site, which is what makes ~10k-taxa ×
    1M-site partitions fit one chip.  tip_encoding="masks" is the
    wide-alphabet variant (protein: 20-bit masks, one int32 word per
    tip/site, from :func:`pack_tipmasks_dyn`).

    impl="vpu" (cyclic-roll FMAs, best for DNA-sized states) or "mxu"
    (block-diagonal [C·S, C·S] matmuls, best for protein); "auto" picks by
    state count.  Inner rows are segment-major (``dyn.inner_row``
    translates level-major ids).

    scale_mode=SCALE_PER_RATE keeps one counter per (site, rate): every
    scaler array holds ``C`` node-major rows per node and the returned
    scalers are [n_inner + 1, C, L] int32 (reference
    PLL_ATTRIB_RATE_SCALERS, `src/core_partials.c:633-644`).
    """
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE, SCALE_PER_RATE):
        raise ValueError(f"unsupported scale mode {scale_mode}")
    if tip_encoding not in _TIP_ENCODINGS:
        raise ValueError(f"unknown tip encoding {tip_encoding!r}")
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    if impl not in ("vpu", "mxu"):
        raise ValueError(f"unknown impl {impl!r}")
    cs = rate_cats * states
    w = states if impl == "vpu" else cs
    lanes = _coeff_lanes(w)
    per = lanes // (2 * w)
    chunk_sz = dyn.chunk
    tiles_per_chunk = -(-chunk_sz // per)
    r_tip, r_imp, r_loc = dyn.r_tip, dyn.r_imp, dyn.r_loc
    n_chunks = dyn.n_chunks
    loc0 = r_tip + r_imp
    n_state = loc0 + r_loc + 1
    sloc0 = r_imp
    n_scal = sloc0 + r_loc + 2  # + dummy + trash (node units)
    per_rate = scale_mode == SCALE_PER_RATE
    srows = rate_cats if per_rate else 1  # scaler rows per node
    rate_mask = make_rate_mask(impl, states, rate_cats)
    contract = _dyn_contract(impl, states, rate_cats, w, mxu_precision)
    decode_tips = _make_tip_decoder(tip_encoding, r_tip, rate_cats, states,
                                    impl)

    def kernel(table_ref, tips_ref, imp_ref, imp_scal_ref, coeff_ref,
               out_ref, out_scal_ref, state, scal):
        j = pl.program_id(0)
        chunk = pl.program_id(1)
        dtype = out_ref.dtype
        thresh, factor = _scale_consts(dtype)
        bl = out_ref.shape[-1]

        @pl.when(chunk == 0)
        def _():
            decode_tips(tips_ref, state, dtype)
            state[r_tip:loc0] = imp_ref[...]
            scal[0:r_imp * srows, :] = imp_scal_ref[...]
            scal[(sloc0 + r_loc) * srows:, :] = jnp.zeros(
                (2 * srows, bl), jnp.int32)

        base = chunk * chunk_sz
        for k in range(chunk_sz):
            row = base + k
            p = table_ref[row, 0]
            c1 = table_ref[row, 1]
            c2 = table_ref[row, 2]
            s1 = table_ref[row, 3]
            s2 = table_ref[row, 4]
            has = table_ref[row, 5]

            tile = k // per
            off = (k % per) * 2 * w
            x = (contract(coeff_ref, tile, off, state[c1], dtype)
                 * contract(coeff_ref, tile, off + w, state[c2], dtype))
            cnt = (scal[pl.ds(s1 * srows, srows), :]
                   + scal[pl.ds(s2 * srows, srows), :])
            if scale_mode == SCALE_PER_SITE:
                mask = ((jnp.max(x, axis=0, keepdims=True) < thresh)
                        & (has > 0))
                # [1,bl] factor row broadcast-multiply instead of a full-tile
                # select: bit-identical (factor is an exact power of
                # two; x*1 == x for x >= 0), one fewer full-tile op
                x = x * jnp.where(mask, factor, jnp.ones((), dtype))
                cnt = cnt + mask.astype(jnp.int32)
            elif per_rate:
                full, perr = rate_mask(x, thresh)
                full = full & (has > 0)
                x = jnp.where(full, x * factor, x)
                cnt = cnt + (perr & (has > 0)).astype(jnp.int32)
            state[p] = x
            scal[pl.ds((sloc0 + base + k) * srows, srows), :] = cnt
            out_ref[k] = x
            out_scal_ref[k * srows:(k + 1) * srows, :] = cnt

    from functools import partial

    @partial(jax.jit, static_argnames=("sites",))
    def one_segment(table, tip_slab, imp, imp_scal, coeff_tiles, sites):
        dtype = imp.dtype
        bl = block_sites
        n_blocks = sites // bl
        z = np.int32(0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks, n_chunks),
            in_specs=[
                _tip_blockspec(tip_encoding, r_tip, cs, bl, 1),
                pl.BlockSpec((r_imp, cs, bl), lambda j, c, t: (z, z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_imp * srows, bl), lambda j, c, t: (z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tiles_per_chunk, cs, lanes),
                             lambda j, c, t: (c, z, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk_sz, cs, bl), lambda j, c, t: (c, z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_sz * srows, bl), lambda j, c, t: (c, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_state, cs, bl), dtype),
                pltpu.VMEM((n_scal * srows, bl), jnp.int32),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((r_loc, cs, sites), dtype),
                jax.ShapeDtypeStruct((r_loc * srows, sites), jnp.int32),
            ],
            interpret=interpret,
        )(table, tip_slab, imp, imp_scal, coeff_tiles)

    def sweep(tip_slabs, tables, m_gathers, pmatrix):
        dtype = pmatrix.dtype
        sites = tip_slabs[0].shape[-1]
        if sites % block_sites:
            raise ValueError(f"sites must divide {block_sites}")
        coeff = (roll_coeff_pmatrices(pmatrix) if impl == "vpu"
                 else block_diag_pmatrices(pmatrix))  # [M, cs, w]

        seg_out, seg_scal = [], []
        for si, s in enumerate(dyn.segments):
            coeff_ops = coeff[m_gathers[si]]  # [n_ops_pad, 2, cs, w]
            coeff_tiles, _ = _pack_op_coeff(coeff_ops, w, chunk_sz)
            if s.imports:
                imp = jnp.concatenate(
                    [seg_out[a][b][None] for (a, b) in s.imports], axis=0)
                imp_scal = jnp.concatenate(
                    [seg_scal[a][b * srows:(b + 1) * srows]
                     for (a, b) in s.imports], axis=0)
                pad = r_imp - len(s.imports)
                if pad:
                    imp = jnp.concatenate(
                        [imp, jnp.zeros((pad, cs, sites), dtype)], axis=0)
                    imp_scal = jnp.concatenate(
                        [imp_scal,
                         jnp.zeros((pad * srows, sites), jnp.int32)],
                        axis=0)
            else:
                imp = jnp.zeros((r_imp, cs, sites), dtype)
                imp_scal = jnp.zeros((r_imp * srows, sites), jnp.int32)
            loc, scal = one_segment(tables[si], tip_slabs[si], imp,
                                    imp_scal, coeff_tiles, sites=sites)
            seg_out.append(loc)
            seg_scal.append(scal)

        inner = jnp.concatenate(
            [o[:s.n_local] for o, s in zip(seg_out, dyn.segments)], axis=0)
        scalers = jnp.concatenate(
            [o[:s.n_local * srows] for o, s in zip(seg_scal, dyn.segments)]
            + [jnp.zeros((srows, sites), jnp.int32)], axis=0)
        if per_rate:
            scalers = scalers.reshape(dyn.n_inner + 1, srows, sites)
        return inner, scalers

    return sweep


def dyn_runtime_args(dyn: DynSchedule):
    """(tables, m_gathers): per-segment device arrays consumed by the
    sweep — the schedule as data."""
    tables = [jnp.asarray(s.table) for s in dyn.segments]
    m_gathers = [jnp.asarray(s.m_ops) for s in dyn.segments]
    return tables, m_gathers


def _export_tables(dyn: DynSchedule):
    """Per-segment export tables [r_exp, 2] (state row, scaler row), padded
    with trash reads; plus the (seg, local) -> export position map."""
    from .clv_pallas_seg import SegmentedSchedule  # noqa: F401 (doc link)

    loc0 = dyn.r_tip + dyn.r_imp
    sloc0 = dyn.r_imp
    trash_state = loc0 + dyn.r_loc
    trash_scal = sloc0 + dyn.r_loc + 1

    # exports = locals referenced by later segments' imports (+ the final
    # segment's eval rows are accessed as locals there, not via exports)
    referenced = {}
    for si, s in enumerate(dyn.segments):
        for (a, b) in s.imports:
            referenced.setdefault(a, set()).add(b)
    r_exp = max(max((len(v) for v in referenced.values()), default=0), 1,
                dyn.min_r_exp)
    tables, pos_of = [], {}
    for si, s in enumerate(dyn.segments):
        exports = sorted(referenced.get(si, set()))
        tab = np.full((r_exp, 2), trash_state, np.int32)
        tab[:, 1] = trash_scal
        for i, l in enumerate(exports):
            tab[i] = (loc0 + l, sloc0 + l)
            pos_of[(si, l)] = i
        tables.append(tab)
    return tables, pos_of, r_exp


def _all_imports(dyn):
    for s in dyn.segments:
        for imp in s.imports:
            yield imp


def dyn_identity_tips(dyn: DynSchedule) -> DynSchedule:
    """Remap a SINGLE-segment schedule's tip references from first-touch
    slab positions to global tip ids, so the packed tip slab becomes
    topology-independent: after an SPR only the (data) tables change and
    the already-compiled kernels re-run with zero retraces — the dyn
    tier's schedule-as-data property applied to full re-scores (fits trees
    whose whole state slab fits VMEM; larger trees use the incremental
    scorer in ops/incremental.py instead)."""
    if len(dyn.segments) != 1:
        raise ValueError("identity tip remap requires a single segment")
    s = dyn.segments[0]
    if len(s.tip_globals) != dyn.tips or dyn.r_tip != dyn.tips:
        raise ValueError("single segment must reference every tip")
    remap = np.asarray(s.tip_globals, np.int64)
    table = s.table.copy()
    for col in (1, 2):
        is_tip = table[:, col] < dyn.r_tip
        table[is_tip, col] = remap[table[is_tip, col]]
    seg = DynSegment(table, s.m_ops, np.arange(dyn.tips, dtype=np.int64),
                     s.imports, s.n_local)
    return DynSchedule((seg,), dyn.tips, dyn.n_inner, dyn.r_tip, dyn.r_imp,
                       dyn.r_loc, dyn.n_chunks, dyn.chunk, dyn.seg_offsets,
                       dyn.loc_of, dyn.min_r_exp)


def dyn_eval_locs(dyn: DynSchedule, parent_lm: int, child_lm: int,
                  scale_mode: int = SCALE_PER_SITE) -> np.ndarray:
    """(p_state, c_state, p_scal, c_scal) int32 for make_dyn_score's
    ``dynamic_edge`` mode — the evaluation-edge location *as data*.

    Single-segment schedules: tip references assume the identity remap of
    :func:`dyn_identity_tips`.  Multi-segment schedules: rows living in a
    non-final segment must reach the root segment through its import list
    or its tip slab — build the schedule with
    ``ensure_rows=[parent_lm, child_lm]`` (clv_pallas_seg routes them via
    the export/import tables) and wire imports as data with
    :func:`dyn_swap_args` so topology moves stay zero-retrace."""
    # scal indices are in node units; the kernel applies its srows factor
    loc0 = dyn.r_tip + dyn.r_imp
    sloc0 = dyn.r_imp
    n_scal = sloc0 + dyn.r_loc + 2
    last = len(dyn.segments) - 1
    fin = dyn.segments[last]
    single = len(dyn.segments) == 1

    def locate(lm):
        if lm < dyn.tips:
            if single:
                # identity tip row; dummy (zero) scaler
                return lm, n_scal - 2
            tg = list(fin.tip_globals)
            if lm not in tg:
                raise ValueError(
                    f"eval tip {lm} not in the final segment's slab — "
                    "build the schedule with ensure_rows")
            return tg.index(lm), n_scal - 2
        sseg, sloc = dyn.loc_of[lm - dyn.tips]
        if sseg == last:
            return loc0 + sloc, sloc0 + sloc
        # non-final row: the ROOT segment's import list position (NOT the
        # exporter's export-table position — those coincide only on chains)
        try:
            pos = list(fin.imports).index((sseg, sloc))
        except ValueError:
            raise ValueError(
                f"eval row {lm} lives in segment {sseg}, not imported by "
                "the final segment — build the schedule with ensure_rows")
        return dyn.r_tip + pos, pos  # import rows

    p_state, p_scal = locate(parent_lm)
    c_state, c_scal = locate(child_lm)
    return np.asarray([p_state, c_state, p_scal, c_scal], np.int32)


def make_dyn_score(dyn: DynSchedule, parent_lm: int, child_lm: int,
                   edge_matrix: int, scale_mode: int = SCALE_PER_SITE, *,
                   rate_cats: int, states: int, block_sites: int = 128,
                   tip_encoding: str = "chars", impl: str = "auto",
                   use_pinv: bool = False, dynamic_edge: bool = False,
                   mxu_precision: str = "highest",
                   interpret: bool = False):
    """Tree-search scoring at unbounded tree size with O(1) compile cost:
    leaf segments keep all CLVs in VMEM scratch and export only the few
    subtree-root rows later segments import; the final segment folds the
    edge log-likelihood into its kernel.  With tip_encoding="chars" the
    only HBM-resident state is ~1 byte/tip/site — a 10k-taxa × 1M-site
    partition scores on a single chip.

    Returns ``score(tip_slabs, tables, m_gathers, exp_tables, pmatrix,
    weight_vec, pattern_weights[, inv_add]) -> logl`` (see
    :func:`dyn_score_args`).  Same model scope as make_fused_edge_score —
    including the linear prop-invar fold (``use_pinv``: caller folds
    ``(1-p_c)`` into weight_vec and passes the [1, L] additive ``inv_add``;
    the reference's fold-then-mix order, `src/core_likelihood.c:960-978`) —
    plus SCALE_PER_RATE with the in-kernel min/cap scaler fold
    (`src/core_likelihood.c:916-941`).
    """
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE, SCALE_PER_RATE):
        raise ValueError(f"unsupported scale mode {scale_mode}")
    if tip_encoding not in _TIP_ENCODINGS:
        raise ValueError(f"unknown tip encoding {tip_encoding!r}")
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    if impl not in ("vpu", "mxu"):
        raise ValueError(f"unknown impl {impl!r}")
    cs = rate_cats * states
    w = states if impl == "vpu" else cs
    lanes = _coeff_lanes(w)
    per = lanes // (2 * w)
    chunk_sz = dyn.chunk
    tiles_per_chunk = -(-chunk_sz // per)
    r_tip, r_imp, r_loc = dyn.r_tip, dyn.r_imp, dyn.r_loc
    n_chunks = dyn.n_chunks
    loc0 = r_tip + r_imp
    n_state = loc0 + r_loc + 1
    sloc0 = r_imp
    n_scal = sloc0 + r_loc + 2  # node units
    last = len(dyn.segments) - 1
    per_rate = scale_mode == SCALE_PER_RATE
    srows = rate_cats if per_rate else 1
    rate_mask = make_rate_mask(impl, states, rate_cats)
    rate_sum = make_rate_sum(impl, states, rate_cats)
    contract = _dyn_contract(impl, states, rate_cats, w, mxu_precision)

    exp_tabs_np, exp_pos, r_exp = _export_tables(dyn)

    # locate eval rows in the final segment's state space
    fin = dyn.segments[last]

    def locate(lm, what):
        if lm < dyn.tips:
            idx = list(fin.tip_globals).index(lm)
            return idx, n_scal - 2  # tip: dummy (zero) scaler
        sseg, sloc = dyn.loc_of[lm - dyn.tips]
        if sseg == last:
            return loc0 + sloc, sloc0 + sloc
        # position in the ROOT segment's import list (NOT the exporter's
        # export-table position — those coincide only in chain topologies)
        pos = list(fin.imports).index((sseg, sloc))
        return r_tip + pos, pos  # import rows
    if dynamic_edge:
        # eval rows arrive as scalar-prefetched DATA (dyn_eval_locs);
        # topology moves swap tables without retracing anything
        p_state = p_scal = c_state = c_scal = None
    else:
        p_state, p_scal = locate(parent_lm, "parent")
        c_state, c_scal = locate(child_lm, "child")

    decode_tips = _make_tip_decoder(tip_encoding, r_tip, rate_cats, states,
                                    impl)

    def op_body(table_ref, coeff_ref, state, scal, chunk, dtype, thresh,
                factor, out_cb):
        base = chunk * chunk_sz
        for k in range(chunk_sz):
            row = base + k
            p = table_ref[row, 0]
            c1 = table_ref[row, 1]
            c2 = table_ref[row, 2]
            s1 = table_ref[row, 3]
            s2 = table_ref[row, 4]
            has = table_ref[row, 5]
            tile = k // per
            off = (k % per) * 2 * w
            x = (contract(coeff_ref, tile, off, state[c1], dtype)
                 * contract(coeff_ref, tile, off + w, state[c2], dtype))
            cnt = (scal[pl.ds(s1 * srows, srows), :]
                   + scal[pl.ds(s2 * srows, srows), :])
            if scale_mode == SCALE_PER_SITE:
                mask = ((jnp.max(x, axis=0, keepdims=True) < thresh)
                        & (has > 0))
                # [1,bl] factor row broadcast-multiply instead of a full-tile
                # select: bit-identical (factor is an exact power of
                # two; x*1 == x for x >= 0), one fewer full-tile op
                x = x * jnp.where(mask, factor, jnp.ones((), dtype))
                cnt = cnt + mask.astype(jnp.int32)
            elif per_rate:
                full, perr = rate_mask(x, thresh)
                x = jnp.where(full & (has > 0), x * factor, x)
                cnt = cnt + (perr & (has > 0)).astype(jnp.int32)
            state[p] = x
            scal[pl.ds((sloc0 + base + k) * srows, srows), :] = cnt
            if out_cb is not None:
                out_cb(k, x, cnt)

    def leaf_kernel(table_ref, exp_table_ref, tips_ref, imp_ref,
                    imp_scal_ref, coeff_ref, exp_ref, exp_scal_ref,
                    state, scal):
        chunk = pl.program_id(1)
        dtype = exp_ref.dtype
        thresh, factor = _scale_consts(dtype)
        bl = exp_ref.shape[-1]

        @pl.when(chunk == 0)
        def _():
            decode_tips(tips_ref, state, dtype)
            state[r_tip:loc0] = imp_ref[...]
            scal[0:r_imp * srows, :] = imp_scal_ref[...]
            scal[(sloc0 + r_loc) * srows:, :] = jnp.zeros(
                (2 * srows, bl), jnp.int32)

        op_body(table_ref, coeff_ref, state, scal, chunk, dtype, thresh,
                factor, None)

        @pl.when(chunk == n_chunks - 1)
        def _():
            for e in range(r_exp):
                exp_ref[e] = state[exp_table_ref[e, 0]]
                exp_scal_ref[e * srows:(e + 1) * srows, :] = scal[
                    pl.ds(exp_table_ref[e, 1] * srows, srows), :]

    def root_kernel(table_ref, *rest):
        if dynamic_edge:
            eval_ref, *rest = rest
            ps, cs_, psc, csc = (eval_ref[i] for i in range(4))
        else:
            ps, cs_, psc, csc = p_state, c_state, p_scal, c_scal
        (tips_ref, imp_ref, imp_scal_ref, coeff_ref, edge_coeff_ref,
         wvec_ref, pw_ref) = rest[:7]
        rest = rest[7:]
        if use_pinv:
            inv_ref, out_ref, state, scal = rest
        else:
            out_ref, state, scal = rest
        chunk = pl.program_id(1)
        j = pl.program_id(0)
        dtype = wvec_ref.dtype
        thresh, factor = _scale_consts(dtype)
        bl = pw_ref.shape[-1]
        log_scale = np.asarray(
            -scale_shift_bits(dtype) * np.log(2.0), dtype)

        @pl.when(chunk == 0)
        def _():
            decode_tips(tips_ref, state, dtype)
            state[r_tip:loc0] = imp_ref[...]
            scal[0:r_imp * srows, :] = imp_scal_ref[...]
            scal[(sloc0 + r_loc) * srows:, :] = jnp.zeros(
                (2 * srows, bl), jnp.int32)

        op_body(table_ref, coeff_ref, state, scal, chunk, dtype, thresh,
                factor, None)

        @pl.when(chunk == n_chunks - 1)
        def _():
            child_row = state[cs_]
            # edge contraction with the edge matrix in its own [cs, w] tile
            if impl == "mxu":
                termb = mxu_dot(edge_coeff_ref[0], child_row, dtype,
                                   mxu_precision)
            else:
                termb = edge_coeff_ref[0, :, 0:1] * child_row
                for d in range(1, w):
                    shift = np.int32((cs - d * rate_cats) % cs)
                    termb = termb + (edge_coeff_ref[0, :, d:d + 1]
                                     * pltpu.roll(child_row, shift, 0))
            y = state[ps] * termb * wvec_ref[...]
            snum = (scal[pl.ds(psc * srows, srows), :]
                    + scal[pl.ds(csc * srows, srows), :])
            if per_rate:
                term_r = rate_sum(y)  # [C, bl]
                term_r, snum = fold_rate_scalers_inkernel(
                    term_r, snum, thresh)
                term = jnp.sum(term_r, axis=0, keepdims=True)
            else:
                term = jnp.sum(y, axis=0, keepdims=True)
            if use_pinv:
                term = term + inv_ref[...]
            lnl = (jnp.log(term)
                   + snum.astype(dtype) * log_scale) * pw_ref[...]
            # per-block partial; the global fold runs outside the kernel
            # at f64 when enabled (see clv_pallas.sum_block_partials)
            out_ref[0, j] = jnp.sum(lnl)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("sites",))
    def leaf_segment(table, exp_table, tip_slab, imp, imp_scal,
                     coeff_tiles, sites):
        dtype = imp.dtype
        bl = block_sites
        n_blocks = sites // bl
        z = np.int32(0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks, n_chunks),
            in_specs=[
                _tip_blockspec(tip_encoding, r_tip, cs, bl, 2),
                pl.BlockSpec((r_imp, cs, bl), lambda j, c, t, e: (z, z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_imp * srows, bl), lambda j, c, t, e: (z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tiles_per_chunk, cs, lanes),
                             lambda j, c, t, e: (c, z, z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((r_exp, cs, bl), lambda j, c, t, e: (z, z, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r_exp * srows, bl), lambda j, c, t, e: (z, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_state, cs, bl), dtype),
                pltpu.VMEM((n_scal * srows, bl), jnp.int32),
            ],
        )
        return pl.pallas_call(
            leaf_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((r_exp, cs, sites), dtype),
                jax.ShapeDtypeStruct((r_exp * srows, sites), jnp.int32),
            ],
            interpret=interpret,
        )(table, exp_table, tip_slab, imp, imp_scal, coeff_tiles)

    n_pref_root = 2 if dynamic_edge else 1

    def _rmap(f):
        """Index map with the arity the root grid spec needs (grid indices
        plus one arg per scalar-prefetch operand)."""
        if n_pref_root == 1:
            return lambda j, c, t: f(j, c)
        return lambda j, c, t, e: f(j, c)

    @_partial(jax.jit, static_argnames=("sites",))
    def root_segment(table, eval_locs, tip_slab, imp, imp_scal, coeff_tiles,
                     edge_coeff, wvec, pw, inv_add, sites):
        dtype = wvec.dtype
        bl = block_sites
        n_blocks = sites // bl
        z = np.int32(0)
        in_specs = [
            _tip_blockspec(tip_encoding, r_tip, cs, bl, n_pref_root),
            pl.BlockSpec((r_imp, cs, bl), _rmap(lambda j, c: (z, z, j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_imp * srows, bl), _rmap(lambda j, c: (z, j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tiles_per_chunk, cs, lanes),
                         _rmap(lambda j, c: (c, z, z)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs, w), _rmap(lambda j, c: (z, z, z)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, 1), _rmap(lambda j, c: (z, z)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl), _rmap(lambda j, c: (z, j)),
                         memory_space=pltpu.VMEM),
        ]
        pref = [table] + ([eval_locs] if dynamic_edge else [])
        args = pref + [tip_slab, imp, imp_scal, coeff_tiles, edge_coeff,
                       wvec, pw]
        if use_pinv:
            in_specs.append(pl.BlockSpec((1, bl),
                                         _rmap(lambda j, c: (z, j)),
                                         memory_space=pltpu.VMEM))
            args.append(inv_add)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref_root,
            grid=(n_blocks, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, n_blocks),
                                   _rmap(lambda j, c: (z, z)),
                                   memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((n_state, cs, bl), dtype),
                pltpu.VMEM((n_scal * srows, bl), jnp.int32),
            ],
        )
        return pl.pallas_call(
            root_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, n_blocks), dtype),
            interpret=interpret,
        )(*args)

    def score(tip_slabs, tables, m_gathers, exp_tables, pmatrix,
              weight_vec, pattern_weights, inv_add=None, eval_locs=None,
              edge_matrix_idx=None, imp_src=None):
        """``imp_src`` (optional, [n_segments, r_imp, 2] int32 of (source
        segment, export position) from :func:`dyn_swap_args`): wire the
        inter-segment imports from DATA instead of this closure's schedule
        — required when swapping in another topology's tables on a
        multi-segment schedule (the closure's import positions would be
        stale)."""
        assert (inv_add is not None) == use_pinv
        assert (eval_locs is not None) == dynamic_edge
        dtype = pmatrix.dtype
        sites = tip_slabs[0].shape[-1]
        if sites % block_sites:
            raise ValueError(f"sites must divide {block_sites}")
        coeff = (roll_coeff_pmatrices(pmatrix) if impl == "vpu"
                 else block_diag_pmatrices(pmatrix))
        em = edge_matrix if edge_matrix_idx is None else edge_matrix_idx
        edge_coeff = coeff[em][None]  # [1, cs, w]

        seg_exp, seg_exp_scal = [], []
        for si, s in enumerate(dyn.segments):
            coeff_ops = coeff[m_gathers[si]]
            coeff_tiles, _ = _pack_op_coeff(coeff_ops, w, chunk_sz)
            if imp_src is not None and si > 0:
                stack = jnp.stack(seg_exp)     # [si, r_exp, cs, sites]
                sstack = jnp.stack(seg_exp_scal).reshape(
                    si, r_exp, srows, sites)
                src = imp_src[si]              # [r_imp, 2]
                imp = stack[src[:, 0], src[:, 1]]
                imp_scal = sstack[src[:, 0], src[:, 1]].reshape(
                    r_imp * srows, sites)
            elif imp_src is None and s.imports:
                imp = jnp.concatenate(
                    [seg_exp[a][exp_pos[(a, b)]][None]
                     for (a, b) in s.imports], axis=0)
                imp_scal = jnp.concatenate(
                    [seg_exp_scal[a][exp_pos[(a, b)] * srows:
                                     (exp_pos[(a, b)] + 1) * srows]
                     for (a, b) in s.imports], axis=0)
                pad = r_imp - len(s.imports)
                if pad:
                    imp = jnp.concatenate(
                        [imp, jnp.zeros((pad, cs, sites), dtype)], axis=0)
                    imp_scal = jnp.concatenate(
                        [imp_scal,
                         jnp.zeros((pad * srows, sites), jnp.int32)],
                        axis=0)
            else:
                imp = jnp.zeros((r_imp, cs, sites), dtype)
                imp_scal = jnp.zeros((r_imp * srows, sites), jnp.int32)
            if si == last:
                out = root_segment(tables[si], eval_locs, tip_slabs[si],
                                   imp, imp_scal, coeff_tiles, edge_coeff,
                                   weight_vec, pattern_weights, inv_add,
                                   sites=sites)
                from .clv_pallas import sum_block_partials
                return sum_block_partials(out[0, :])
            exp, exp_scal = leaf_segment(tables[si], exp_tables[si],
                                         tip_slabs[si], imp, imp_scal,
                                         coeff_tiles, sites=sites)
            seg_exp.append(exp)
            seg_exp_scal.append(exp_scal)

    score._root_segment = root_segment
    score._leaf_segment = leaf_segment
    return score


def dyn_score_args(dyn: DynSchedule):
    """(tables, m_gathers, exp_tables) device arrays for make_dyn_score."""
    tables, m_gathers = dyn_runtime_args(dyn)
    exp_tabs_np, _, _ = _export_tables(dyn)
    return tables, m_gathers, [jnp.asarray(x) for x in exp_tabs_np]


def dyn_swap_args(dyn: DynSchedule):
    """(tables, m_gathers, exp_tables, imp_src) for zero-retrace table
    swaps on MULTI-segment schedules: the inter-segment import wiring is
    returned as DATA ([n_segments, r_imp, 2] int32 of (source segment,
    export position)) so another topology's tables can be swapped into an
    already-compiled make_dyn_score without touching its closure.  Both
    topologies must be built with matching envelope floors
    (``min_r_tip/min_r_imp/min_segments/min_r_exp`` on
    :func:`build_dyn_schedule`) and, for the evaluation edge, with
    ``ensure_rows`` so :func:`dyn_eval_locs` can route it (reference
    counterpart: full re-evaluation after `pll_utree_spr`,
    src/utree_moves.c:119-253)."""
    tables, m_gathers = dyn_runtime_args(dyn)
    exp_tabs_np, pos_of, _ = _export_tables(dyn)
    src = np.zeros((len(dyn.segments), dyn.r_imp, 2), np.int32)
    for si, s in enumerate(dyn.segments):
        for k, (a, b) in enumerate(s.imports):
            src[si, k] = (a, pos_of[(a, b)])
    return (tables, m_gathers, [jnp.asarray(x) for x in exp_tabs_np],
            jnp.asarray(src))
