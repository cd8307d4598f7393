"""Full-tree Newton branch-length optimization (engine/blopt.py).

The reference ships the per-branch pattern (examples/newton/newton.c:
sumtable once per branch, cheap Newton iterations on it); this pipeline
applies it over all 2n-3 edges in pre-order with dirty-subtree CLV reuse,
a device-resident Newton while_loop per edge, and safeguarded acceptance."""

from _common import dna_partition

from libpll_tpu.engine import blopt
from libpll_tpu.tree import utree as ut


def main():
    tree, part, trav = dna_partition()

    # perturb the branch lengths so there is something to optimize
    for n in tree.nodes:
        for m in ([n] if n.is_tip else n.ring()):
            m.length = m.back.length = m.length * 2.5

    ops, blens, midx = ut.create_operations(ut.traverse(tree.root))
    part.update_prob_matrices([0] * part.rate_cats, midx, blens)
    part.update_partials(ops)
    r = tree.root
    logl0 = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, [0] * part.rate_cats)
    print(f"perturbed logL: {logl0:.6f}")

    logl, sweeps = blopt.optimize_branch_lengths(tree, part,
                                                 [0] * part.rate_cats)
    print(f"optimized logL: {logl:.6f}  ({sweeps} sweeps over all "
          f"{2 * tree.tip_count - 3} edges)")
    print("optimized tree:", ut.export_newick(tree.root)[:70], "...")


if __name__ == "__main__":
    main()
