"""Segmented fused Pallas sweep — large trees that exceed one VMEM slab.

The single-slab kernel (ops/clv_pallas.py) holds every node's CLV block in
VMEM, which caps the tree at ~600 rows (DNA, 128-site blocks).  For larger
trees this module cuts the tree bottom-up into **subtree segments** whose
row count fits VMEM; each segment's kernel consumes its own tip slab plus a
handful of *imported* subtree-root rows exported by earlier segments, and
exports its own root(s).  Cross-segment traffic is one CLV row (+ one
scaler row) per cut — negligible against the tip stream — so the memory
behavior stays "tips in once, inners out once" at any tree size.

Segmenting algorithm: DFS from the root; a node whose accumulated subtree
row count would exceed the budget closes its larger child subtree into a
segment and replaces it with a virtual tip (size 1), repeating until the
node fits.  Emitted segments therefore hold ≤ R rows each and the final
(root) segment holds the remainder; capacity is effectively unbounded
because cuts nest arbitrarily deep.

Two products per segmented schedule:
  * ``make_segmented_sweep``  — all inner CLVs + scaler rows to HBM
    (segment-major row numbering; use ``inner_row``/``scaler_row`` to
    translate level-major ids);
  * ``make_segmented_score`` — tree-search scoring: only export rows touch
    HBM, the root segment folds the edge log-likelihood into its kernel
    (same scope as clv_pallas.make_fused_edge_score).

Reference semantics: identical scaling-counter scheme as the XLA sweep
(libpll `src/core_partials.c:607-663`, `fill_parent_scaler`
`core_partials.c:24-46`); see ops/clv_pallas.py for the contraction docs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import (SCALE_NONE, SCALE_PER_RATE, SCALE_PER_SITE,
                               scale_shift_bits)
from .clv import _scale_consts
from .clv_pallas import (_VMEM_BUDGET, _flatten_ops, block_diag_pmatrices,
                         coeff_lane_width, fold_rate_scalers_inkernel,
                         gather_coeff, lane_pack_coeff, make_contract,
                         make_rate_mask, make_rate_sum,
                         roll_coeff_pmatrices)
from .sweep import LevelSchedule


@dataclass
class Segment:
    """One VMEM-sized kernel invocation.

    Child references are ("tip", i) into this segment's tip slab,
    ("imp", i) into its gathered import rows, or ("loc", i) into its own
    local rows.  Scaler references likewise, with ("zero",) for tips /
    no-scaler children (reads as 0, matching the level-major dummy row).
    """

    tip_globals: List[int] = field(default_factory=list)  # global tip ids
    imports: List[Tuple[int, int]] = field(default_factory=list)  # (seg, loc)
    ops: List[tuple] = field(default_factory=list)
    # (local_parent, csrc1, m1, csrc2, m2, ssrc1, ssrc2, has_scaler)
    export_locals: List[int] = field(default_factory=list)

    @property
    def n_local(self) -> int:
        return len(self.ops)


@dataclass
class SegmentedSchedule:
    segments: List[Segment]
    tips: int
    n_inner: int
    tip_perm: np.ndarray  # [tips] global tip id per permuted position
    tip_slab_sizes: List[int]
    # level-major inner row -> (segment, local row)
    loc_of: Dict[int, Tuple[int, int]]
    seg_offsets: List[int]  # segment-major global row offsets

    def inner_row(self, level_major_inner_row: int) -> int:
        s, l = self.loc_of[level_major_inner_row]
        return self.seg_offsets[s] + l

    def scaler_row(self, level_major_inner_row: int) -> int:
        return self.inner_row(level_major_inner_row)


def _max_rows(cs: int, sites: int, itemsize: int,
              block_sites: Optional[int]) -> Tuple[int, int]:
    bl = block_sites or 128
    # tip/import/local CLV rows, double-buffered, plus scaler rows
    per_row = 2 * (cs * bl * itemsize + bl * 4)
    return max(8, _VMEM_BUDGET // per_row), bl


def build_segmented_schedule(schedule: LevelSchedule, *, rate_cats: int,
                             states: int, itemsize: int = 4,
                             block_sites: Optional[int] = None,
                             max_rows: Optional[int] = None,
                             ensure_rows: Sequence[int] = ()
                             ) -> SegmentedSchedule:
    """``ensure_rows``: level-major CLV ids the *final* segment must be able
    to reference (e.g. the evaluation edge's child) — added to its tip slab
    or imports if the walk didn't reach them."""
    tips, n_inner = schedule.tips, schedule.n_inner
    flat = _flatten_ops(schedule)
    if max_rows is None:
        max_rows, _ = _max_rows(rate_cats * states, 0, itemsize, block_sites)

    # The op schedule is a FOREST over level-major global ids: an unrooted
    # evaluation has two trees, one per endpoint of the evaluation edge
    # (utree.create_operations computes CLVs for both).
    op_of = {tips + o[0]: o for o in flat}  # parent global id -> op tuple
    child_set = {o[1] for o in flat} | {o[3] for o in flat}
    roots = [g for g in op_of if g not in child_set]

    segments: List[Segment] = []
    seg_of: Dict[int, Tuple[int, int]] = {}  # inner global -> (seg, local)

    def emit_segment(vs: Sequence[int]) -> None:
        """Close the uncut remainders of the subtrees at ``vs`` into one
        segment."""
        seg = Segment()
        si = len(segments)
        tip_pos: Dict[int, int] = {}
        imp_pos: Dict[Tuple[int, int], int] = {}

        def csrc(g: int):
            if g < tips:
                if g not in tip_pos:
                    tip_pos[g] = len(seg.tip_globals)
                    seg.tip_globals.append(g)
                return ("tip", tip_pos[g])
            if g in seg_of:
                key = seg_of[g]
                if key not in imp_pos:
                    imp_pos[key] = len(seg.imports)
                    seg.imports.append(key)
                    segments[key[0]].export_locals.append(key[1])
                return ("imp", imp_pos[key])
            return ("loc", local_of[g])

        def ssrc(s_level_major: int, g_child: int):
            # mirror ops/sweep.py srow semantics: dummy (zero) for tips and
            # no-scaler children, else the child's own counter row
            if s_level_major >= n_inner or g_child < tips:
                return ("zero",)
            src = csrc(g_child)
            return ("simp", src[1]) if src[0] == "imp" else ("sloc", src[1])

        local_of: Dict[int, int] = {}

        def walk(g: int) -> None:  # post-order over the uncut subtree
            (_, c1, m1, c2, m2, s1, s2, has) = op_of[g]
            for c in (c1, c2):
                if c >= tips and c not in seg_of and c not in local_of:
                    walk(c)
            src1, src2 = csrc(c1), csrc(c2)
            sr1, sr2 = ssrc(s1, c1), ssrc(s2, c2)
            local_of[g] = len(seg.ops)
            seg.ops.append((local_of[g], src1, m1, src2, m2, sr1, sr2, has))

        for v in vs:
            if v not in seg_of:
                walk(v)
        segments.append(seg)
        for g, l in local_of.items():
            seg_of[g] = (si, l)

    size: Dict[int, int] = {}

    def visit(g: int) -> int:
        (_, c1, m1, c2, m2, *_rest) = op_of[g]
        s1 = visit(c1) if c1 >= tips else 1
        s2 = visit(c2) if c2 >= tips else 1
        s = s1 + s2 + 1
        while s > max_rows:
            big, sb = ((c1, s1) if s1 >= s2 else (c2, s2))
            if big < tips or big in seg_of:
                # can't shrink further; accept oversize (tiny max_rows)
                break
            emit_segment([big])
            s = s - sb + 1
            if big == c1:
                s1 = 1
            else:
                s2 = 1
        size[g] = s
        return s

    # deep recursion on caterpillar trees: raise the limit for the walk
    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * (tips + n_inner) + 1000))
    try:
        sizes = {r: visit(r) for r in roots}
        # the final segment merges every root's remainder; if the union
        # exceeds the budget, spill the largest roots into own segments
        while (sum(sizes.values()) > max_rows
               and max(sizes.values()) > 1):
            r = max(sizes, key=sizes.get)
            emit_segment([r])
            sizes[r] = 1
        emit_segment(roots)
    finally:
        sys.setrecursionlimit(old_limit)

    # the final segment must be able to reference the roots and any
    # requested rows (e.g. the evaluation edge child for the score kernel)
    final_si = len(segments) - 1
    final = segments[final_si]
    for g in list(roots) + [int(r) for r in ensure_rows]:
        if g < tips:
            if g not in final.tip_globals:
                final.tip_globals.append(g)
        else:
            s_i, l = seg_of[g]
            if s_i == final_si:
                if l not in final.export_locals:
                    final.export_locals.append(l)
            else:
                if (s_i, l) not in final.imports:
                    final.imports.append((s_i, l))
                if l not in segments[s_i].export_locals:
                    segments[s_i].export_locals.append(l)

    tip_perm = np.concatenate(
        [np.asarray(s.tip_globals, np.int64) for s in segments
         if s.tip_globals])
    # every tip is referenced; ensure_rows may duplicate one into the final
    # segment's slab, so coverage (not partition) is the invariant
    assert len(set(tip_perm.tolist())) == tips, (tip_perm.size, tips)

    offsets, acc = [], 0
    for s in segments:
        offsets.append(acc)
        acc += s.n_local
    assert acc == n_inner

    loc_of = {g - tips: sl for g, sl in seg_of.items()}
    return SegmentedSchedule(segments, tips, n_inner, tip_perm,
                             [len(s.tip_globals) for s in segments],
                             loc_of, offsets)


def pack_tips_segmented(tips_clv: jax.Array, seg: SegmentedSchedule,
                        impl: str) -> List[jax.Array]:
    """[tips, C, S, L] -> per-segment packed tip slabs (run once at setup;
    the permutation makes every segment's tips contiguous)."""
    from .clv_pallas import pack_tips

    packed = pack_tips(tips_clv, impl)
    cs, sites = packed.shape[1], packed.shape[2]
    out = []
    for s in seg.segments:
        if s.tip_globals:
            out.append(jnp.take(packed,
                                jnp.asarray(np.asarray(s.tip_globals)),
                                axis=0))
        else:
            out.append(jnp.zeros((1, cs, sites), packed.dtype))
    return out


def _segment_matrix_map(seg: Segment, extra: Sequence[int] = ()):
    """Used matrix ids of one segment -> (sorted ids, remapped op list)."""
    used = sorted({o[2] for o in seg.ops} | {o[4] for o in seg.ops}
                  | set(int(e) for e in extra))
    pos = {m: i for i, m in enumerate(used)}
    ops = [(lp, s1, pos[m1], s2, pos[m2], r1, r2, has)
           for (lp, s1, m1, s2, m2, r1, r2, has) in seg.ops]
    return used, ops


def _segment_kernel_body(ops, contract, scale_mode, thresh, factor,
                         bl, tips_ref, imp_ref, imp_scal_ref, coeff_ref,
                         loc_ref, scal_ref, srows=1, rate_mask=None):
    """Shared per-segment op loop writing local rows into loc/scal refs.

    ``srows`` is the scaler rows per node (1 per-site, C per-rate); all
    scaler arrays are node-major blocks of that many rows."""
    def child(src):
        kind, i = src[0], src[1] if len(src) > 1 else 0
        if kind == "tip":
            return tips_ref[i]
        if kind == "imp":
            return imp_ref[i]
        return loc_ref[i]

    def scaler(src):
        if src[0] == "zero":
            return jnp.zeros((srows, bl), jnp.int32)
        i = src[1]
        if src[0] == "simp":
            return imp_scal_ref[i * srows:(i + 1) * srows, :]
        return scal_ref[i * srows:(i + 1) * srows, :]

    for (lp, src1, m1, src2, m2, sr1, sr2, has) in ops:
        x = contract(coeff_ref, m1, child(src1)) * contract(
            coeff_ref, m2, child(src2))
        cnt = scaler(sr1) + scaler(sr2)
        if scale_mode == SCALE_PER_SITE and has:
            mask = jnp.max(x, axis=0, keepdims=True) < thresh
            # [1,bl] factor row broadcast-multiply instead of a full-tile
            # select: bit-identical (factor is an exact power of
            # two; x*1 == x for x >= 0), one fewer full-tile op
            x = x * jnp.where(mask, factor, jnp.ones((), x.dtype))
            cnt = cnt + mask.astype(jnp.int32)
        elif scale_mode == SCALE_PER_RATE and has:
            full, perr = rate_mask(x, thresh)
            x = jnp.where(full, x * factor, x)
            cnt = cnt + perr.astype(jnp.int32)
        loc_ref[lp] = x
        scal_ref[lp * srows:(lp + 1) * srows, :] = cnt


def _nz(n):
    return max(n, 1)


def make_segmented_sweep(seg: SegmentedSchedule,
                         scale_mode: int = SCALE_PER_SITE, *,
                         impl: str = "auto", rate_cats: int, states: int,
                         block_sites: Optional[int] = None,
                         interpret: bool = False):
    """Build ``sweep(tip_slabs, pmatrix) -> (inner, scalers)`` for large
    trees.  ``inner`` is [n_inner, C*S, L] in *segment-major* rows
    (translate with seg.inner_row); ``scalers`` [n_inner + 1, L] likewise,
    last row the zero dummy ([n_inner + 1, C, L] with SCALE_PER_RATE)."""
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE, SCALE_PER_RATE):
        raise ValueError(f"unsupported scale mode {scale_mode}")
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    cs = rate_cats * states
    srows = rate_cats if scale_mode == SCALE_PER_RATE else 1
    rate_mask = make_rate_mask(impl, states, rate_cats)

    def sweep(tip_slabs: Sequence[jax.Array], pmatrix):
        dtype = tip_slabs[0].dtype
        sites = tip_slabs[0].shape[-1]
        thresh, factor = _scale_consts(dtype)
        itemsize = np.dtype(dtype).itemsize
        _, bl = _max_rows(cs, sites, itemsize, block_sites)
        if sites % bl != 0:
            raise ValueError(f"sites ({sites}) must be divisible by {bl}")
        n_blocks = sites // bl
        coeff = (block_diag_pmatrices(pmatrix) if impl == "mxu"
                 else roll_coeff_pmatrices(pmatrix))
        contract = make_contract(impl, states, rate_cats, dtype)
        z = np.int32(0)
        nd = len(coeff.shape)

        seg_out: List[jax.Array] = []
        seg_scal: List[jax.Array] = []
        for si, s in enumerate(seg.segments):
            if s.imports:
                rows = [seg_out[a][b][None] for (a, b) in s.imports]
                imp = jnp.concatenate(rows, axis=0)
                scal_rows = [seg_scal[a][b * srows:(b + 1) * srows]
                             for (a, b) in s.imports]
                imp_scal = jnp.concatenate(scal_rows, axis=0)
            else:
                imp = jnp.zeros((1, cs, sites), dtype)
                imp_scal = jnp.zeros((srows, sites), jnp.int32)
            tslab = tip_slabs[si]
            n_tip, n_imp, k = tslab.shape[0], imp.shape[0], s.n_local
            used, rops = _segment_matrix_map(s)
            coeff_s = lane_pack_coeff(
                gather_coeff(coeff, used),
                coeff_lane_width(impl, states, rate_cats))

            def kernel(tips_ref, imp_ref, imp_scal_ref, coeff_ref,
                       loc_ref, scal_ref, rops=rops):
                _segment_kernel_body(rops, contract, scale_mode, thresh,
                                     factor, bl, tips_ref, imp_ref,
                                     imp_scal_ref, coeff_ref, loc_ref,
                                     scal_ref, srows=srows,
                                     rate_mask=rate_mask)

            loc, scal = pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((n_tip, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_imp, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_imp * srows, bl), lambda j: (z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(coeff_s.shape, lambda j: (z,) * nd,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((k, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k * srows, bl), lambda j: (z, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((k, cs, sites), dtype),
                    jax.ShapeDtypeStruct((k * srows, sites), jnp.int32),
                ],
                compiler_params=_compiler_params(),
                interpret=interpret,
            )(tslab, imp, imp_scal, coeff_s)
            seg_out.append(loc)
            seg_scal.append(scal)

        inner = jnp.concatenate(seg_out, axis=0)
        scalers = jnp.concatenate(
            seg_scal + [jnp.zeros((srows, sites), jnp.int32)], axis=0)
        if srows > 1:
            scalers = scalers.reshape(seg.n_inner + 1, srows, sites)
        return inner, scalers

    return sweep


def make_segmented_score(seg: SegmentedSchedule, parent_lm: int,
                         child_lm: int, edge_matrix: int,
                         scale_mode: int = SCALE_PER_SITE, *,
                         impl: str = "auto", rate_cats: int, states: int,
                         block_sites: Optional[int] = None,
                         interpret: bool = False):
    """Large-tree tree-search scoring: leaf segments export only their
    subtree-root rows; the final segment folds the edge log-likelihood into
    its kernel.  ``parent_lm``/``child_lm`` are level-major CLV ids (as in
    EvalTopology).  Same model scope as make_fused_edge_score, plus
    SCALE_PER_RATE (in-kernel min/cap scaler fold,
    `src/core_likelihood.c:916-941`)."""
    if scale_mode not in (SCALE_NONE, SCALE_PER_SITE, SCALE_PER_RATE):
        raise ValueError(f"unsupported scale mode {scale_mode}")
    if impl == "auto":
        impl = "vpu" if states <= 8 else "mxu"
    cs = rate_cats * states
    tips = seg.tips
    last = len(seg.segments) - 1
    per_rate = scale_mode == SCALE_PER_RATE
    srows = rate_cats if per_rate else 1
    rate_mask = make_rate_mask(impl, states, rate_cats)
    rate_sum = make_rate_sum(impl, states, rate_cats)

    # locate evaluation-edge rows within the root segment's address space
    def locate(lm, what):
        if lm < tips:
            root_tips = seg.segments[last].tip_globals
            if lm not in root_tips:
                raise ValueError(f"edge {what} tip not in root segment; "
                                 "build with ensure_rows=[parent, child]")
            return ("tip", root_tips.index(lm))
        sseg, sloc = seg.loc_of[lm - tips]
        if sseg == last:
            return ("loc", sloc)
        imports = seg.segments[last].imports
        if (sseg, sloc) not in imports:
            raise ValueError(f"edge {what} not importable; build with "
                             "ensure_rows=[parent, child]")
        return ("imp", imports.index((sseg, sloc)))

    if parent_lm < tips:
        raise ValueError("edge parent must be an inner node")
    parent_src = locate(parent_lm, "parent")
    child_src = locate(child_lm, "child")

    def score(tip_slabs: Sequence[jax.Array], pmatrix, weight_vec,
              pattern_weights):
        dtype = tip_slabs[0].dtype
        sites = tip_slabs[0].shape[-1]
        thresh, factor = _scale_consts(dtype)
        itemsize = np.dtype(dtype).itemsize
        log_scale = np.asarray(-scale_shift_bits(dtype) * np.log(2.0), dtype)
        _, bl = _max_rows(cs, sites, itemsize, block_sites)
        if sites % bl != 0:
            raise ValueError(f"sites ({sites}) must be divisible by {bl}")
        n_blocks = sites // bl
        coeff = (block_diag_pmatrices(pmatrix) if impl == "mxu"
                 else roll_coeff_pmatrices(pmatrix))
        contract = make_contract(impl, states, rate_cats, dtype)
        z = np.int32(0)
        nd = len(coeff.shape)

        seg_exp: List[jax.Array] = []
        seg_exp_scal: List[jax.Array] = []
        result = None
        for si, s in enumerate(seg.segments):
            exports = sorted(set(s.export_locals))
            exp_pos = {l: i for i, l in enumerate(exports)}
            if s.imports:
                imp = jnp.concatenate(
                    [seg_exp[a][_exp_pos_of(seg, a, b)][None]
                     for (a, b) in s.imports], axis=0)
                imp_scal = jnp.concatenate(
                    [seg_exp_scal[a][_exp_pos_of(seg, a, b) * srows:
                                     (_exp_pos_of(seg, a, b) + 1) * srows]
                     for (a, b) in s.imports], axis=0)
            else:
                imp = jnp.zeros((1, cs, sites), dtype)
                imp_scal = jnp.zeros((srows, sites), jnp.int32)
            tslab = tip_slabs[si]
            n_tip, n_imp, k = tslab.shape[0], imp.shape[0], s.n_local
            is_root = si == last
            used, rops = _segment_matrix_map(
                s, extra=[edge_matrix] if is_root else [])
            coeff_s = lane_pack_coeff(
                gather_coeff(coeff, used),
                coeff_lane_width(impl, states, rate_cats))

            if is_root:
                edge_m = used.index(edge_matrix)

                def kernel(tips_ref, imp_ref, imp_scal_ref, coeff_ref,
                           wvec_ref, pw_ref, out_ref, loc_ref, scal_ref,
                           rops=rops, edge_m=edge_m):
                    _segment_kernel_body(rops, contract, scale_mode, thresh,
                                         factor, bl, tips_ref, imp_ref,
                                         imp_scal_ref, coeff_ref, loc_ref,
                                         scal_ref, srows=srows,
                                         rate_mask=rate_mask)
                    def row_of(src):
                        kind, i = src
                        return (tips_ref[i] if kind == "tip"
                                else imp_ref[i] if kind == "imp"
                                else loc_ref[i])

                    def scal_of(src):
                        kind, i = src
                        if kind == "tip":
                            return jnp.zeros((srows, bl), jnp.int32)
                        if kind == "imp":
                            return imp_scal_ref[i * srows:(i + 1) * srows, :]
                        return scal_ref[i * srows:(i + 1) * srows, :]

                    termb = contract(coeff_ref, edge_m, row_of(child_src))
                    y = row_of(parent_src) * termb * wvec_ref[...]
                    snum = scal_of(parent_src) + scal_of(child_src)
                    if per_rate:
                        term_r = rate_sum(y)  # [C, bl]
                        term_r, snum = fold_rate_scalers_inkernel(
                            term_r, snum, thresh)
                        term = jnp.sum(term_r, axis=0, keepdims=True)
                    else:
                        term = jnp.sum(y, axis=0, keepdims=True)
                    lnl = (jnp.log(term)
                           + snum.astype(dtype) * log_scale) * pw_ref[...]
                    # per-block partial; global fold outside the kernel at
                    # f64 when enabled (clv_pallas.sum_block_partials)
                    out_ref[0, pl.program_id(0)] = jnp.sum(lnl)

                result = pl.pallas_call(
                    kernel,
                    grid=(n_blocks,),
                    in_specs=[
                        pl.BlockSpec((n_tip, cs, bl), lambda j: (z, z, j),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((n_imp, cs, bl), lambda j: (z, z, j),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((n_imp * srows, bl), lambda j: (z, j),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec(coeff_s.shape, lambda j: (z,) * nd,
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((cs, 1), lambda j: (z, z),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, bl), lambda j: (z, j),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, n_blocks), lambda j: (z, z),
                                           memory_space=pltpu.SMEM),
                    out_shape=jax.ShapeDtypeStruct((1, n_blocks), dtype),
                    scratch_shapes=[
                        pltpu.VMEM((k, cs, bl), dtype),
                        pltpu.VMEM((k * srows, bl), jnp.int32),
                    ],
                    compiler_params=_compiler_params(),
                    interpret=interpret,
                )(tslab, imp, imp_scal, coeff_s, weight_vec,
                  pattern_weights)
                break

            n_exp = _nz(len(exports))

            def kernel(tips_ref, imp_ref, imp_scal_ref, coeff_ref,
                       exp_ref, exp_scal_ref, loc_ref, scal_ref,
                       rops=rops, exports=exports):
                _segment_kernel_body(rops, contract, scale_mode, thresh,
                                     factor, bl, tips_ref, imp_ref,
                                     imp_scal_ref, coeff_ref, loc_ref,
                                     scal_ref, srows=srows,
                                     rate_mask=rate_mask)
                for i, l in enumerate(exports):
                    exp_ref[i] = loc_ref[l]
                    exp_scal_ref[i * srows:(i + 1) * srows, :] = (
                        scal_ref[l * srows:(l + 1) * srows, :])

            exp, exp_scal = pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((n_tip, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_imp, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_imp * srows, bl), lambda j: (z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(coeff_s.shape, lambda j: (z,) * nd,
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((n_exp, cs, bl), lambda j: (z, z, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((n_exp * srows, bl), lambda j: (z, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((n_exp, cs, sites), dtype),
                    jax.ShapeDtypeStruct((n_exp * srows, sites), jnp.int32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((k, cs, bl), dtype),
                    pltpu.VMEM((k * srows, bl), jnp.int32),
                ],
                compiler_params=_compiler_params(),
                interpret=interpret,
            )(tslab, imp, imp_scal, coeff_s)
            seg_exp.append(exp)
            seg_exp_scal.append(exp_scal)

        from .clv_pallas import sum_block_partials
        return sum_block_partials(result[0, :])

    return score


def _exp_pos_of(seg: SegmentedSchedule, si: int, local: int) -> int:
    exports = sorted(set(seg.segments[si].export_locals))
    return exports.index(local)


def _compiler_params():
    try:
        return pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:  # pragma: no cover
        return None
