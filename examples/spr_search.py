"""Likelihood SPR hill-climbing with batched incremental candidate scoring.

The round driver (search/spr.py) evaluates a whole SPR neighborhood in one
compiled device call per batch: each candidate replays only its dirty op
subset (the clv_valid partial-traversal mechanism of reference
examples/partial-traversal + utree_moves.c) into scratch rows, so a
candidate costs O(path length), not a full-tree sweep, and no topology
change ever triggers a recompile."""

import numpy as np

from _common import dna_partition

from libpll_tpu.search import spr as spr_search
from libpll_tpu.tree import utree as ut


def main():
    tree, part, trav = dna_partition()
    cap = 16
    scorer = spr_search.make_round_scorer(part, cap)

    for rnd in range(5):
        res = spr_search.spr_round(tree, part, [0] * part.rate_cats,
                                   radius=5, capacity=cap, batch=16,
                                   scorer=scorer)
        print(f"round {rnd}: {res.n_candidates} candidates, "
              f"logL {res.logl0:.6f} -> {res.best_logl:.6f} "
              f"(improved={res.improved}, max dirty ops {res.n_ops_max})")
        if not res.improved:
            break

    print("final tree:", ut.export_newick(tree.root)[:70], "...")
    print("scorer compilations:", scorer._cache_size(),
          "(zero recompiles after warmup)")


if __name__ == "__main__":
    main()
