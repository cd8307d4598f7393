"""Randomized stepwise-addition parsimony tree construction.

Port of reference examples/stepwise (pll_fastparsimony_stepwise): seeded
taxon shuffle (exact random.c RNG parity), greedy insertion with batched
candidate-edge Fitch scoring."""

from _common import SEQS

import numpy as np

import libpll_tpu as pll
from libpll_tpu.search.parsimony import FastParsimony
from libpll_tpu.search.stepwise import fastparsimony_stepwise
from libpll_tpu.tree import utree as ut


def main():
    labels = sorted(SEQS)
    seqs = [SEQS[k] for k in labels]
    part = FastParsimony.from_sequences(seqs, pll.maps.pll_map_nt, 4)
    tree, score = fastparsimony_stepwise([part], labels, seed=42)
    print(f"stepwise parsimony score: {score}")
    print("tree:", ut.export_newick(tree.root))


if __name__ == "__main__":
    main()
