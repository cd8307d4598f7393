"""The dyn tier's no-recompile property on full re-scores: after an SPR,
rebuilding only the schedule TABLES (plus eval locs and edge-matrix index —
all data) and re-invoking the already-compiled make_dyn_score must produce
the moved topology's exact logL with ZERO retraces (single-segment trees;
the identity tip remap makes the packed tip slab topology-independent)."""

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
