"""Partial-traversal CLV reuse after an SPR move.

Port of reference examples/partial-traversal (partial.c): per-direction
``clv_valid`` flags track which orientation each ring's CLV buffer holds;
after a topology move only the invalidated CLVs are recomputed (a strict
subset of the full schedule) and the logL matches a full recomputation."""

from _common import dna_partition

from libpll_tpu.errors import SprError
from libpll_tpu.tree import incremental as inc
from libpll_tpu.tree import moves, utree as ut


def full_evaluate(tree, part):
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * part.rate_cats, midx, blens)
    part.update_partials(ops)
    inc.mark_valid(trav)
    return edge_logl(tree, part), len(ops)


def partial_evaluate(tree, part, changed):
    """Refresh only the changed P-matrices + the dirty op subset."""
    if changed:
        part.update_prob_matrices([0] * part.rate_cats,
                                  [m for _, m in changed],
                                  [b for b, _ in changed])
    ops = inc.create_partial_operations(inc.partial_traverse(tree.root))
    if ops:
        part.update_partials(ops)
    return edge_logl(tree, part), len(ops)


def edge_logl(tree, part):
    r = tree.root
    return part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, [0] * part.rate_cats)


def main():
    tree, part, trav = dna_partition()
    logl, n_full = full_evaluate(tree, part)
    print(f"initial logL: {logl:.6f}  ({n_full} CLV ops)")

    inner = [n for n in trav if not n.is_tip and n is not tree.root]
    rb = moves.Rollback(moves.MOVE_SPR)
    for p in inner:
        for r in trav:
            try:
                changed = moves.spr_safe(p, r, rollback=rb)
                break
            except SprError:
                changed = None
        if changed:
            break
    print(f"SPR changed {len(changed)} branches "
          f"(pmatrix idx {[m for _, m in changed]})")

    logl2, n_part = partial_evaluate(tree, part, changed)
    print(f"after SPR:   {logl2:.6f}  ({n_part}/{n_full} CLV ops recomputed)")

    restored = moves.rollback_move(rb)
    logl3, n_back = partial_evaluate(tree, part, restored)
    print(f"rolled back: {logl3:.6f}  ({n_back}/{n_full} ops; matches "
          f"initial: {abs(logl3 - logl) < 1e-12})")


if __name__ == "__main__":
    main()
