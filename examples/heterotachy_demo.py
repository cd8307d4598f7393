"""Heterotachy: different branches evolve under different rate matrices.

Port of reference examples/heterotachy (heterotachy.c:41-48): assign
distinct GTR matrices to distinct branch groups via repeated
update_prob_matrices calls with different params_indices."""

import numpy as np

from _common import SEQS, dna_partition

from libpll_tpu.tree import utree as ut


def main():
    import libpll_tpu as pll

    tree = ut.parse_newick_string(
        "((A:0.10,B:0.20):0.30,((C:0.15,D:0.25):0.12,"
        "(E:0.08,F:0.30):0.22):0.05,G:0.40);")
    tips = tree.tip_count
    part = pll.Partition(tips, tips - 2, 4, len(SEQS["A"]), 2,
                         2 * tips - 3, 4, tips - 2)
    trav = ut.traverse(tree.root)
    for n in trav:
        if n.label:
            part.set_tip_states(n.clv_index, pll.maps.pll_map_nt,
                                SEQS[n.label])
    part.set_frequencies(0, [0.25] * 4)
    part.set_subst_params(0, [1, 1, 1, 1, 1, 1])       # JC-like
    part.set_frequencies(1, [0.4, 0.1, 0.1, 0.4])
    part.set_subst_params(1, [1, 4, 1, 1, 4, 1])       # strong ti/tv
    part.set_category_rates(pll.compute_gamma_cats(1.0, 4))

    ops, blens, midx = ut.create_operations(trav)
    half = len(midx) // 2
    # first half of the branches under matrix 0, the rest under matrix 1
    part.update_prob_matrices([0] * 4, midx[:half], blens[:half])
    part.update_prob_matrices([1] * 4, midx[half:], blens[half:])
    part.update_partials(ops)
    r = tree.root
    logl = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, [0] * 4)
    print(f"heterotachy logL: {logl:.6f}")


if __name__ == "__main__":
    main()
