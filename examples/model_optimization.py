"""Model-parameter optimization (engine/modelopt.py).

The reference library leaves model fitting to its callers — users pair
pll_set_subst_params / pll_set_frequencies / pll_compute_gamma_cats with an
external optimizer.  Here it is one call: GTR exchangeabilities and
frequencies by L-BFGS through the differentiable eigendecomposition
(jnp.linalg.eigh inside the traced program), Γ shape by Brent's method on
one reusable compiled scorer."""

from _common import SEQS, dna_partition

import libpll_tpu as pll


def main():
    tree, part, trav = dna_partition(rate_cats=4, alpha=1.0)

    res = pll.optimize_model(part, tree, opt_alpha=True, rounds=2)

    print(f"start logL: {res.trajectory[0]:.6f}")
    print(f"final logL: {res.logl:.6f}")
    print("exchangeabilities:",
          " ".join(f"{v:.4f}" for v in res.subst_params))
    print("frequencies:      ",
          " ".join(f"{v:.4f}" for v in res.frequencies))
    print(f"gamma shape alpha: {res.alpha:.4f}")

    # the partition now carries the fitted model: any downstream
    # evaluation / search uses it automatically
    assert (part.subst_params[0] == res.subst_params).all()


if __name__ == "__main__":
    main()
