"""Empirical amino-acid models and the LG4X mixture.

Port of reference examples/protein-list + lg4: evaluate a protein alignment
under several empirical models, then under LG4X where each Gamma category
has its own rate matrix + frequencies (per-category params_indices)."""

import numpy as np

from _common import NEWICK

import libpll_tpu as pll
from libpll_tpu.models.aa_tables import AA_MIXTURE_MODELS, AA_MODELS
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.io import maps
from libpll_tpu.tree import utree as ut

AAS = "ARNDCQEGHILKMFPSTWYV"
RNG = np.random.default_rng(7)
SITES = 30


def main():
    tree = ut.parse_newick_string(NEWICK)
    tips = tree.tip_count
    trav = ut.traverse(tree.root)
    ops, blens, midx = ut.create_operations(trav)
    seqs = {n.label: "".join(RNG.choice(list(AAS), SITES))
            for n in trav if n.label}

    for model in ("lg", "wag", "jtt", "dayhoff", "blosum62"):
        rates_tbl, freqs_tbl = AA_MODELS[model]
        part = pll.Partition(tips, tips - 2, 20, SITES, 1,
                             2 * tips - 3, 4, tips - 2)
        for n in trav:
            if n.label:
                part.set_tip_states(n.clv_index, maps.pll_map_aa,
                                    seqs[n.label])
        part.set_frequencies(0, freqs_tbl)
        part.set_subst_params(0, rates_tbl)
        part.set_category_rates(compute_gamma_cats(1.0, 4))
        part.update_prob_matrices([0] * 4, midx, blens)
        part.update_partials(ops)
        r = tree.root
        logl = part.compute_edge_loglikelihood(
            r.clv_index, r.scaler_index, r.back.clv_index,
            r.back.scaler_index, r.pmatrix_index, [0] * 4)
        print(f"{model:10s} logL = {logl:.6f}")

    # LG4X mixture: one rate matrix per Gamma category
    rates4, freqs4 = AA_MIXTURE_MODELS["lg4x"]
    part = pll.Partition(tips, tips - 2, 20, SITES, 4,
                         2 * tips - 3, 4, tips - 2)
    for n in trav:
        if n.label:
            part.set_tip_states(n.clv_index, maps.pll_map_aa, seqs[n.label])
    for k in range(4):
        part.set_frequencies(k, freqs4[k])
        part.set_subst_params(k, rates4[k])
    part.set_category_rates(compute_gamma_cats(0.9, 4))
    pidx = np.arange(4)  # category k -> matrix k
    part.update_prob_matrices(pidx, midx, blens)
    part.update_partials(ops)
    r = tree.root
    logl = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, pidx)
    print(f"{'lg4x':10s} logL = {logl:.6f}")


if __name__ == "__main__":
    main()
