"""Full-tree edge log-likelihood on an unrooted tree.

Port of reference examples/unrooted + newick-fasta-unrooted: parse a newick,
build the operation schedule from a post-order traversal, compute all
transition matrices and partials, and evaluate the logL across the root
edge (reference flow: SURVEY §3.1)."""

from _common import dna_partition

from libpll_tpu.tree import utree as ut


def main():
    tree, part, trav = dna_partition()
    ops, blens, midx = ut.create_operations(trav)
    part.update_prob_matrices([0] * part.rate_cats, midx, blens)
    part.update_partials(ops)
    r = tree.root
    logl = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, [0] * part.rate_cats)
    print(f"Log-likelihood: {logl:.6f}")


if __name__ == "__main__":
    main()
