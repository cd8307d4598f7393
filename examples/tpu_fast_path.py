"""The TPU fast paths: fused Pallas forward, tree-search scoring, and the
Newton training step (no reference equivalent — this is the rebuild's
TPU-first API).

Runs in Pallas interpreter mode on CPU by default; on a real TPU
(LIBPLL_EXAMPLES_TPU=1) the kernels compile natively."""

import os

from _common import dna_partition

import numpy as np
import jax
import jax.numpy as jnp

from libpll_tpu.engine.evaluate import (make_forward_fused, make_score,
                                        make_train_step_fused,
                                        topology_from_tree)
from libpll_tpu.models.gamma import compute_gamma_cats
from libpll_tpu.models.gtr import eigen_decompose
from libpll_tpu.ops import clv_pallas as cp
from libpll_tpu.tree import utree as ut

INTERPRET = not bool(os.environ.get("LIBPLL_EXAMPLES_TPU"))


def main():
    tree, part, trav = dna_partition()
    sites, rate_cats = part.sites, part.rate_cats
    topo, branches = topology_from_tree(tree, sites)

    params = [1.2, 2.4, 0.9, 1.1, 3.0, 1.0]
    freqs = np.asarray([0.3, 0.25, 0.25, 0.2])
    w, left, right = eigen_decompose(np.asarray(params), freqs)
    dtype = jnp.float32
    model = {
        "branch_lengths": jnp.asarray(branches, dtype),
        "rates": jnp.asarray(compute_gamma_cats(0.8, rate_cats), dtype),
        "prop_invar": jnp.zeros((1,), dtype),
        "params_indices": jnp.zeros(rate_cats, np.int32),
        "eigenvals": jnp.asarray(w[None], dtype),
        "left": jnp.asarray(left[None], dtype),
        "right": jnp.asarray(right[None], dtype),
        "freqs_pc": jnp.asarray(np.broadcast_to(freqs, (rate_cats, 4)),
                                dtype),
        "prop_invar_pc": jnp.zeros((rate_cats,), dtype),
        "rate_weights": jnp.full((rate_cats,), 1.0 / rate_cats, dtype),
        "pattern_weights": jnp.ones((sites,), dtype),
        "invariant": jnp.full((sites,), -1, jnp.int32),
    }
    # pad sites to the kernel's 128-lane block
    pad = (-sites) % 128
    if pad:
        sites_p = sites + pad
        topo = topo._replace(sites=sites_p)
        model["pattern_weights"] = jnp.concatenate(
            [model["pattern_weights"], jnp.zeros((pad,), dtype)])
        model["invariant"] = jnp.concatenate(
            [model["invariant"], jnp.full((pad,), -1, jnp.int32)])
    tips_clv = jnp.concatenate(
        [jnp.asarray(part.clv[:part.tips], dtype),
         jnp.ones((part.tips, rate_cats, 4, pad), dtype)], axis=-1)

    tp = cp.pack_tips(tips_clv, "mxu")
    fwd = make_forward_fused(topo, rate_cats, 4, impl="mxu",
                             interpret=INTERPRET)
    logl, _, _, _ = fwd(model, tp)
    print(f"fused forward logL: {float(logl):.4f}")

    score = make_score(topo, rate_cats, 4, impl="mxu", interpret=INTERPRET)
    print(f"fused edge-score logL: {float(score(model, tp)):.4f}")

    step = make_train_step_fused(topo, rate_cats, 4, impl="mxu",
                                 interpret=INTERPRET)
    logl, t_star = step(model, tp)
    print(f"Newton step: logL={float(logl):.4f}  t*={float(t_star):.6f}")


if __name__ == "__main__":
    main()
