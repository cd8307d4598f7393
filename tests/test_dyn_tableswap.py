"""The dyn tier's no-recompile property on full re-scores: after an SPR,
rebuilding only the schedule TABLES (plus eval locs and edge-matrix index —
all data) and re-invoking the already-compiled make_dyn_score must produce
the moved topology's exact logL with ZERO retraces.

Single-segment trees: the identity tip remap makes the packed tip slab
topology-independent.  Multi-segment (giant) trees: the envelope floors of
build_dyn_schedule pin every compiled shape across topologies, the
inter-segment import wiring travels as data (dyn_swap_args), and the
evaluation edge is routed into the root segment through the export/import
tables (ensure_rows) wherever it lives."""

import numpy as np
import pytest

import jax.numpy as jnp

from libpll_tpu.engine import evaluate as ev
from libpll_tpu.ops import clv_pallas as cp
from libpll_tpu.ops import clv_pallas_dyn as cpd
from libpll_tpu.tree import moves, utree as ut
from libpll_tpu.utils.constants import SCALE_PER_SITE

from test_clv_pallas_seg import _build, _random_tree_newick

TIPS, SITES, CATS, STATES = 16, 128, 4, 4


def _dyn_for(tree, masks, kernel_state=None):
    """(dyn schedule with identity tips, score args, eval locs, edge)."""
    topo, branches = ev.topology_from_tree(tree, SITES,
                                           scale_mode=SCALE_PER_SITE)
    dyn = cpd.build_dyn_schedule(
        topo.schedule, rate_cats=CATS, states=STATES, chunk=8,
        ensure_rows=[topo.parent_clv, topo.child_clv])
    dyn = cpd.dyn_identity_tips(dyn)
    tables, m_g, exp_t = cpd.dyn_score_args(dyn)
    locs = cpd.dyn_eval_locs(dyn, topo.parent_clv, topo.child_clv)
    return topo, branches, dyn, tables, m_g, exp_t, locs


def test_spr_table_swap_zero_recompiles():
    rng = np.random.default_rng(6)
    newick = _random_tree_newick(TIPS, rng)
    topo0, model, pmatrix, clv, scalers = _build(newick, sites=SITES)
    tree = ut.parse_newick_string(newick)
    t = topo0.schedule.tips

    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(STATES, dtype=np.uint32)[None, :, None]).sum(1)

    topo, branches, dyn, tables, m_g, exp_t, locs = _dyn_for(tree, masks)
    slabs = cpd.pack_tipchars_dyn(masks, dyn)
    score = cpd.make_dyn_score(
        dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_SITE, rate_cats=CATS, states=STATES, tip_encoding="chars",
        impl="vpu", dynamic_edge=True, interpret=True)

    def model_for(branches):
        m = dict(model)
        m["branch_lengths"] = jnp.asarray(branches, jnp.float32)
        return m

    def evaluate(topo_x, branches, tables, m_gx, exp_tx, locs):
        mm = model_for(branches)
        pm = ev._pmatrices(mm, topo_x, jnp.float32)
        wvec = cp.pack_weight_vec(mm["freqs_pc"], mm["rate_weights"], "vpu")
        pw = mm["pattern_weights"].astype(jnp.float32)[None, :]
        return float(score(slabs, tables, m_gx, exp_tx, pm, wvec, pw,
                           eval_locs=jnp.asarray(locs),
                           edge_matrix_idx=topo_x.edge_matrix))

    got0 = evaluate(topo, branches, tables, m_g, exp_t, locs)
    want0, _ = ev.make_forward(topo0)(model, clv, scalers)
    np.testing.assert_allclose(got0, float(want0), rtol=2e-6)
    compiles0 = (score._root_segment._cache_size()
                 + score._leaf_segment._cache_size())

    # SPR, then table swap on the SAME compiled kernels
    from libpll_tpu.errors import SprError
    trav = ut.traverse(tree.root)
    inner = [n for n in trav if not n.is_tip and n is not tree.root]
    moved = 0
    for p in inner:
        for r in trav:
            try:
                moves.spr_safe(p, r)
            except SprError:
                continue
            (topo2, branches2, dyn2, tables2, m_g2, exp_t2,
             locs2) = _dyn_for(tree, masks)
            # the envelope is topology-independent: same compiled shapes
            assert (dyn2.r_tip, dyn2.r_imp, dyn2.r_loc, dyn2.n_chunks) == \
                (dyn.r_tip, dyn.r_imp, dyn.r_loc, dyn.n_chunks)
            got = evaluate(topo2, branches2, tables2, m_g2, exp_t2, locs2)

            # truth: XLA forward on the moved topology
            topo2f, branches2f = ev.topology_from_tree(
                tree, SITES, scale_mode=SCALE_PER_SITE)
            m2 = dict(model)
            m2["branch_lengths"] = jnp.asarray(branches2f, jnp.float32)
            clv2 = jnp.zeros_like(clv).at[:t].set(clv[:t])
            want, _ = ev.make_forward(topo2f)(m2, clv2, scalers)
            np.testing.assert_allclose(got, float(want), rtol=2e-6)
            moved += 1
            break
        if moved >= 3:
            break
    assert moved >= 3

    compiles1 = (score._root_segment._cache_size()
                 + score._leaf_segment._cache_size())
    assert compiles1 == compiles0, "table swap retraced the kernels"


def test_spr_table_swap_multisegment_zero_recompiles():
    """VERDICT round-2 gap: the eval edge may live in ANY segment.  Force a
    5-segment schedule (tiny max_rows), pin the envelope with floors (incl.
    an inert pad segment via min_segments), and assert (a) logL parity with
    the XLA forward after each SPR table swap, (b) zero kernel retraces,
    (c) at least one scored topology routed a NON-final eval row through
    the export/import tables — the class the round-2 eval-edge bug hid in."""
    # seed chosen so the segmentation cut lands at the eval child: the
    # child row is then computed in an early segment on every topology
    # below (asserted), exercising the import routing
    rng = np.random.default_rng(7)
    newick = _random_tree_newick(TIPS, rng)
    topo0, model, pmatrix, clv, scalers = _build(newick, sites=SITES)
    tree = ut.parse_newick_string(newick)
    t = topo0.schedule.tips

    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(STATES, dtype=np.uint32)[None, :, None]).sum(1)

    MAX_ROWS = 8

    def build(floors):
        topo, branches = ev.topology_from_tree(tree, SITES,
                                               scale_mode=SCALE_PER_SITE)
        dyn = cpd.build_dyn_schedule(
            topo.schedule, rate_cats=CATS, states=STATES, chunk=8,
            max_rows=MAX_ROWS,
            ensure_rows=[topo.parent_clv, topo.child_clv], **floors)
        tables, m_g, exp_t, imp_src = cpd.dyn_swap_args(dyn)
        locs = cpd.dyn_eval_locs(dyn, topo.parent_clv, topo.child_clv)
        slabs = cpd.pack_tipchars_dyn(masks, dyn)
        return topo, branches, dyn, tables, m_g, exp_t, imp_src, locs, slabs

    probe = build({})[2]
    from libpll_tpu.ops.clv_pallas_dyn import _export_tables
    r_exp0 = _export_tables(probe)[2]
    floors = dict(min_r_tip=probe.r_tip + 2, min_r_imp=probe.r_imp + 2,
                  min_r_loc=probe.r_loc, min_segments=len(probe.segments) + 1,
                  min_r_exp=r_exp0 + 2)

    (topo, branches, dyn, tables, m_g, exp_t, imp_src, locs,
     slabs) = build(floors)
    assert len(dyn.segments) > 2, "config must be multi-segment"
    env = (len(dyn.segments), dyn.r_tip, dyn.r_imp, dyn.r_loc, dyn.n_chunks)

    score = cpd.make_dyn_score(
        dyn, topo.parent_clv, topo.child_clv, topo.edge_matrix,
        SCALE_PER_SITE, rate_cats=CATS, states=STATES, tip_encoding="chars",
        impl="vpu", dynamic_edge=True, interpret=True)

    def evaluate(topo_x, branches_x, tables_x, m_gx, exp_tx, imp_sx,
                 locs_x, slabs_x):
        mm = dict(model)
        mm["branch_lengths"] = jnp.asarray(branches_x, jnp.float32)
        pm = ev._pmatrices(mm, topo_x, jnp.float32)
        wvec = cp.pack_weight_vec(mm["freqs_pc"], mm["rate_weights"], "vpu")
        pw = mm["pattern_weights"].astype(jnp.float32)[None, :]
        return float(score(slabs_x, tables_x, m_gx, exp_tx, pm, wvec, pw,
                           eval_locs=jnp.asarray(locs_x),
                           edge_matrix_idx=topo_x.edge_matrix,
                           imp_src=imp_sx))

    def routed(dyn_x, topo_x):
        last = len(dyn_x.segments) - 1
        return any(lm >= dyn_x.tips
                   and dyn_x.loc_of[lm - dyn_x.tips][0] != last
                   for lm in (topo_x.parent_clv, topo_x.child_clv))

    got0 = evaluate(topo, branches, tables, m_g, exp_t, imp_src, locs, slabs)
    want0, _ = ev.make_forward(topo0)(model, clv, scalers)
    np.testing.assert_allclose(got0, float(want0), rtol=2e-6)
    compiles0 = (score._root_segment._cache_size()
                 + score._leaf_segment._cache_size())

    from libpll_tpu.errors import SprError
    trav = ut.traverse(tree.root)
    inner = [n for n in trav if not n.is_tip and n is not tree.root]
    moved, routed_seen = 0, routed(dyn, topo)
    for p in inner:
        for r in trav:
            try:
                moves.spr_safe(p, r)
            except SprError:
                continue
            (topo2, branches2, dyn2, tables2, m_g2, exp_t2, imp_src2,
             locs2, slabs2) = build(floors)
            env2 = (len(dyn2.segments), dyn2.r_tip, dyn2.r_imp, dyn2.r_loc,
                    dyn2.n_chunks)
            assert env2 == env, "envelope floors must absorb the move"
            routed_seen |= routed(dyn2, topo2)
            got = evaluate(topo2, branches2, tables2, m_g2, exp_t2,
                           imp_src2, locs2, slabs2)

            topo2f, branches2f = ev.topology_from_tree(
                tree, SITES, scale_mode=SCALE_PER_SITE)
            m2 = dict(model)
            m2["branch_lengths"] = jnp.asarray(branches2f, jnp.float32)
            clv2 = jnp.zeros_like(clv).at[:t].set(clv[:t])
            want, _ = ev.make_forward(topo2f)(m2, clv2, scalers)
            np.testing.assert_allclose(got, float(want), rtol=2e-6)
            moved += 1
            break
        if moved >= 4:
            break
    assert moved >= 4
    assert routed_seen, "no topology exercised a non-final eval row"

    compiles1 = (score._root_segment._cache_size()
                 + score._leaf_segment._cache_size())
    assert compiles1 == compiles0, "table swap retraced the kernels"
