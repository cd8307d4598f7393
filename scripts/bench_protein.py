#!/usr/bin/env python3
"""Protein (20-state) kernel roofline on the chip.

Three measurements, all k-chain timed (this platform's
`block_until_ready` does not fence; see BASELINE.md timing note):

1. dense f32 MXU peak — a 4096³ matmul at HIGHEST precision (the
   package-wide setting) and at DEFAULT (bf16-grade) for context; this
   anchors the roofline's denominator on *this* chip rather than a
   datasheet number;
2. the protein fused score (MXU block-diag contraction, bitmask pattern
   tips) at 64 × 16 384 × Γ4 — the BASELINE.md protein flagship config;
3. the dyn (schedule-as-data) protein score at 256 × 16 384.

Roofline accounting: one inner×inner site-rate update costs
2 children × 20×20 MACs ≈ 1 600 useful flops.  The MXU sees each child
contraction as an 80×80 (= 4 Γ-cats of 20 states, block-diagonal) by
80×128 dot padded to 128-tiles, so the useful fraction of issued MXU work
is (80/128)² × (4·20²/80²) = 4·20²/128² ≈ 9.77%; the ceiling for useful
protein flops is therefore ≈ 0.0977 × dense-f32 peak.

Usage: python scripts/bench_protein.py [sites]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

SITES = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
CHAIN = 9


def timeit_chain(make_chain, *args, reps=3):
    def run(k):
        f = make_chain(k)
        float(np.asarray(f(*args)).ravel()[0])  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(*args)).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best
    t1, tk = run(1), run(CHAIN)
    return (tk - t1) / (CHAIN - 1)


def dense_peak(n=4096, precision="highest"):
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                    jnp.float32)

    def make_chain(k):
        @jax.jit
        def f(a):
            x = a
            for _ in range(k):
                x = jnp.dot(x, a, precision=precision)
                x = x / jnp.max(jnp.abs(x))  # keep finite, serialize
            return jnp.sum(x[0, :1])
        return f

    dt = timeit_chain(make_chain, a)
    return 2 * n**3 / dt


def protein_score(tips, sites, dyn, precision="highest"):
    from libpll_tpu.engine import evaluate as ev
    from test_clv_pallas_seg import _build

    sys.path.insert(0, "tests")
    from test_clv_pallas import _random_tree_newick

    rng = np.random.default_rng(5)
    topo, model, pmatrix, clv, scalers = _build(
        _random_tree_newick(tips, rng), sites=sites, states=20, seed=5)
    t = topo.schedule.tips
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(20, dtype=np.uint32)[None, :, None]).sum(1)

    if dyn:
        score = ev.make_score_unbounded(topo, 4, 20, masks,
                                        mxu_precision=precision)
        args = (model,)
    else:
        score = ev.make_score(topo, 4, 20, impl="mxu",
                              tip_encoding="masks",
                              mxu_precision=precision)
        tp = jnp.asarray(masks.astype(np.int32))
        args = (model, tp)

    def make_chain(k):
        @jax.jit
        def f(model, *rest):
            total = jnp.zeros((), jnp.float32)
            m = dict(model)
            for _ in range(k):
                s = score(m, *rest)
                total = total + s.astype(jnp.float32)
                m["branch_lengths"] = model["branch_lengths"] + s * 1e-30
            return total
        return f

    dt = timeit_chain(make_chain, model, *args[1:])
    n_updates = (t - 2) * 4 * sites
    return dt, n_updates, float(score(*args))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    sys.path.insert(0, "tests")

    pk_hi = dense_peak(precision="highest")
    pk_high = dense_peak(precision="high")
    pk_def = dense_peak(precision="default")
    print(f"dense 4096^3 f32 matmul: HIGHEST {pk_hi/1e12:.1f} Tflop/s, "
          f"HIGH(bf16x3) {pk_high/1e12:.1f} Tflop/s, "
          f"DEFAULT(bf16-grade) {pk_def/1e12:.1f} Tflop/s", flush=True)
    pack = 4 * 20**2 / 128**2
    ceil = pack * pk_hi
    print(f"protein MXU packing fraction {pack*100:.2f}% -> useful-flop "
          f"ceiling {ceil/1e12:.2f} Tflop/s "
          f"= {ceil/1600/1e9:.2f}e9 site-rate updates/s", flush=True)

    for tips, dyn, name in ((64, False, "fused score (bitmask tips)"),
                            (256, True, "dyn score (bitmask tips)")):
        logls = {}
        for prec in ("highest", "high"):
            dt, upd, logls[prec] = protein_score(tips, SITES, dyn, prec)
            rate = upd / dt
            c = ceil if prec == "highest" else 2 * ceil  # bf16x3 ~ 2x
            print(f"{name} {tips} x {SITES} [{prec}]: {dt*1e3:.2f} ms/eval"
                  f" = {rate/1e9:.2f}e9 updates/s = {rate*1600/1e12:.2f} "
                  f"Tflop/s useful = {rate*1600/c*100:.0f}% of packing "
                  f"ceiling", flush=True)
        d = abs(logls["high"] - logls["highest"])
        budget = 2e-6 * abs(logls["highest"]) + 5e-3
        print(f"  |logL_high - logL_highest| = {d:.4f} "
              f"(f32 budget at this |logL|: {budget:.3f})", flush=True)


if __name__ == "__main__":
    main()
