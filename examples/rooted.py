"""Root log-likelihood on a rooted tree.

Port of reference examples/rooted + rooted-tacg: rooted-tree traversal,
operations, and the root logL (reference rtree.c flow)."""

from _common import SEQS

import libpll_tpu as pll
from libpll_tpu.tree import rtree as rt

ROOTED = ("(((A:0.10,B:0.20):0.30,(C:0.15,D:0.25):0.12):0.05,"
          "((E:0.08,F:0.30):0.22,G:0.40):0.10);")


def main():
    tree = rt.parse_newick_string(ROOTED)
    tips = tree.tip_count
    part = pll.Partition(tips, tips - 1, 4, len(SEQS["A"]), 1,
                         2 * tips - 2, 4, tips - 1)
    trav = rt.traverse(tree.root)
    order = {n.label: n.clv_index for n in trav if n.label}
    for lab, seq in SEQS.items():
        part.set_tip_states(order[lab], pll.maps.pll_map_nt, seq)
    part.set_frequencies(0, [0.3, 0.25, 0.25, 0.2])
    part.set_subst_params(0, [1.2, 2.4, 0.9, 1.1, 3.0, 1.0])
    part.set_category_rates(pll.compute_gamma_cats(0.8, 4))

    ops, blens, midx = rt.create_operations(trav)
    part.update_prob_matrices([0] * 4, midx, blens)
    part.update_partials(ops)
    logl = part.compute_root_loglikelihood(
        tree.root.clv_index, tree.root.scaler_index, [0] * 4)
    print(f"Rooted log-likelihood: {logl:.6f}")


if __name__ == "__main__":
    main()
