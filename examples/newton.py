"""Newton-Raphson branch-length optimization of one edge.

Port of reference examples/newton (newton.c:31-100): build the sumtable
once, then iterate t <- t - L'/L'' on analytic derivatives."""

from _common import dna_partition

from libpll_tpu.tree import utree as ut


def main():
    tree, part, trav = dna_partition()
    ops, blens, midx = ut.create_operations(trav)
    pidx = [0] * part.rate_cats
    part.update_prob_matrices(pidx, midx, blens)
    part.update_partials(ops)
    r = tree.root
    k_root = list(midx).index(r.pmatrix_index)

    st = part.update_sumtable(r.clv_index, r.back.clv_index,
                              r.scaler_index, r.back.scaler_index, pidx)
    t = blens[k_root]
    print(f"start  t={t:.6f}")
    for it in range(32):
        d1, d2 = part.compute_likelihood_derivatives(
            r.scaler_index, r.back.scaler_index, t, pidx, st)
        if abs(d1) < 1e-9:
            break
        t = min(max(t - d1 / d2, 1e-8), 100.0)
        print(f"iter {it}: t={t:.6f}  d1={d1:+.6e}  d2={d2:+.6e}")

    bl = list(blens); bl[k_root] = t
    part.update_prob_matrices(pidx, midx, bl)
    part.update_partials(ops)
    logl = part.compute_edge_loglikelihood(
        r.clv_index, r.scaler_index, r.back.clv_index, r.back.scaler_index,
        r.pmatrix_index, pidx)
    print(f"optimized t*={t:.6f}  logL={logl:.6f}")


if __name__ == "__main__":
    main()
