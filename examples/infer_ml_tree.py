"""Complete ML tree inference: parsimony start -> alternating SPR rounds
and device-resident branch-length sweeps (search/infer.py) — the workflow
libpll users assemble by hand from stepwise.c + utree_moves.c + the newton
example, as one call."""

import numpy as np

import _common  # noqa: F401  (sys.path + CPU default for examples)
from libpll_tpu.search.infer import infer_tree
from libpll_tpu.tree import utree as ut


def main():
    rng = np.random.default_rng(1)
    labels = [f"t{i}" for i in range(10)]
    seqs = {lab: "".join(rng.choice(list("ACGT"), 60)) for lab in labels}

    res = infer_tree(seqs, alpha=0.9, seed=42, radius=6, max_rounds=6)
    print(f"parsimony start score: {res.start_parsimony_score}")
    print(f"logL trajectory: " + " -> ".join(f"{x:.2f}"
                                             for x in res.trajectory))
    print(f"final logL {res.logl:.4f} after {res.rounds} rounds")
    print("tree:", ut.export_newick(res.tree.root)[:70], "...")


if __name__ == "__main__":
    main()
