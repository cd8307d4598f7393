"""Weighted (Sankoff) parsimony with ancestral reconstruction.

Port of reference examples/parsimony: build per-site per-state minimum
mutation costs with an arbitrary score matrix, score the tree, reconstruct
ancestral states."""

import numpy as np

from _common import SEQS, dna_partition

import libpll_tpu as pll
from libpll_tpu.search.parsimony import Parsimony
from libpll_tpu.tree import utree as ut


def main():
    tree, part, trav = dna_partition()
    pars = Parsimony(tree.tip_count, 4, len(SEQS["A"]),
                     score_matrix=1 - np.eye(4),
                     score_buffers=tree.tip_count - 2,
                     ancestral_buffers=tree.tip_count - 2)
    order = {n.label: n.clv_index for n in trav if n.label}
    for lab, seq in SEQS.items():
        pars.set_sequence(order[lab], pll.maps.pll_map_nt, seq)

    buildops = ut.create_pars_buildops(trav)
    score = pars.build(buildops)
    print(f"Sankoff parsimony score: {score}")


if __name__ == "__main__":
    main()
