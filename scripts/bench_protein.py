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

Roofline accounting (corrected in round 4 — measured kernel throughput
EXCEEDED the round-3 ceiling, falsifying its cost model): one inner×inner
site-rate update costs 2 children × 20×20 MACs = 1 600 useful flops per
site column.  The MXU sees each child contraction as an 80×80 (4 Γ-cats
of 20 states, block-diagonal) by 80×bl dot.  Mosaic pads the K
(contraction) axis to 128 lanes but NOT the M (output-row) axis — the
round-3 model assumed a full 128×128 pass and predicted 4·20²/128² ≈
9.77%, yet the kernel measured 135% of that "ceiling".  With issued work
= M·K_pad·N = 80·128·bl, the useful fraction is 4·20²/(80·128) = S/128 ≈
15.63% — and this is *structural*: any block-diagonal packing of S-state
blocks has output-row density S/128 regardless of block count (packing 6
blocks scales M and useful flops together), so S/128 × dense peak is the
speed of light for an exact-f32 20-state CLV contraction on this MXU.
The remaining levers are pass count (``high`` = manual bf16x3, ~2× the
HIGHEST f32-exact throughput at ~2.5e-5 relative CLV error, measured
within the f32 logL budget below) and the non-MXU kernel residue.

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


def timeit_chain(make_chain, *args, pairs=7):
    """Median of interleaved chain-pair differences (the bench.py round-4
    methodology): compiling f1 and fK once, then timing them back-to-back
    per pair, cancels the platform drift that corrupted the old
    best-of-3(t1) / best-of-3(tK) split — observed phantom rates up to
    163% of a hard roofline when t1 and tK were minutes apart."""
    import statistics

    f1, fk = make_chain(1), make_chain(CHAIN)
    float(np.asarray(f1(*args)).ravel()[0])  # compile + warm
    float(np.asarray(fk(*args)).ravel()[0])

    def once(f):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        return time.perf_counter() - t0

    dts = []
    for i in range(pairs):
        if i % 2 == 0:
            a, b = once(f1), once(fk)
        else:
            b, a = once(fk), once(f1)
        dts.append((b - a) / (CHAIN - 1))
    return statistics.median(dts)


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

    # long chain (one DEFAULT-precision link is ~0.7 ms, far below the
    # platform's dispatch noise) with interleaved-pair differencing
    import statistics

    f1, fk = make_chain(1), make_chain(65)
    float(np.asarray(f1(a)).ravel()[0])
    float(np.asarray(fk(a)).ravel()[0])

    def once(f):
        t0 = time.perf_counter()
        float(np.asarray(f(a)).ravel()[0])
        return time.perf_counter() - t0

    dts = []
    for i in range(5):
        if i % 2 == 0:
            x, y = once(f1), once(fk)
        else:
            y, x = once(fk), once(f1)
        dts.append((y - x) / 64)
    return 2 * n**3 / statistics.median(dts)


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
            for i in range(k):
                s = score(m, *rest)
                total = total + s.astype(jnp.float32)
                # data-dependent, ABOVE f32 ulp: s*1e-30 underflows to a
                # no-op at f32, leaving identical chain links XLA can CSE
                # (observed: a "146% of f32 ceiling" phantom measurement)
                m["branch_lengths"] = (model["branch_lengths"]
                                       + s * jnp.float32((i + 1) * 1e-12))
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
    pack = 20 / 128  # S/128: output-row density of any S-state block-diag
    ceil = pack * pk_hi
    print(f"protein MXU packing fraction {pack*100:.2f}% (S/128, "
          f"structural) -> useful-flop ceiling {ceil/1e12:.2f} Tflop/s "
          f"= {ceil/1600/1e9:.2f}e9 site-rate updates/s at HIGHEST",
          flush=True)

    for tips, dyn, name in ((64, False, "fused score (bitmask tips)"),
                            (256, True, "dyn score (bitmask tips)")):
        logls = {}
        for prec in ("highest", "high"):
            dt, upd, logls[prec] = protein_score(tips, SITES, dyn, prec)
            rate = upd / dt
            # the bf16x3 ceiling scales by the measured dense-peak ratio
            c = ceil if prec == "highest" else ceil * pk_high / pk_hi
            print(f"{name} {tips} x {SITES} [{prec}]: {dt*1e3:.2f} ms/eval"
                  f" = {rate/1e9:.2f}e9 updates/s = {rate*1600/1e12:.2f} "
                  f"Tflop/s useful = {rate*1600/c*100:.0f}% of packing "
                  f"ceiling", flush=True)
        d = abs(logls["high"] - logls["highest"])
        budget = 2e-6 * abs(logls["highest"]) + 5e-3
        print(f"  |logL_high - logL_highest| = {d:.4f} "
              f"(f32 budget at this |logL|: {budget:.3f})", flush=True)

    # deep-tree accuracy of bf16x3: a 256-taxon caterpillar compounds the
    # per-level ~2.5e-5 relative CLV error worst-case (dyn scorer — a
    # 256-taxon protein slab exceeds the fused kernel's VMEM budget)
    from test_accuracy import _caterpillar_newick
    from test_clv_pallas_seg import _build
    from libpll_tpu.engine import evaluate as ev
    topo, model, _, clv, _ = _build(_caterpillar_newick(256), sites=2048,
                                    states=20, seed=7)
    t = topo.schedule.tips
    clv_np = np.asarray(clv[:t])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(20, dtype=np.uint32)[None, :, None]).sum(1)
    vals = {}
    for prec in ("highest", "high"):
        s = ev.make_score_unbounded(topo, 4, 20, masks, mxu_precision=prec)
        vals[prec] = float(s(model))
    d = abs(vals["high"] - vals["highest"])
    budget = 2e-6 * abs(vals["highest"]) + 5e-3
    print(f"deep caterpillar 256 x 2048 protein: |logL_high - "
          f"logL_highest| = {d:.4f} (f32 budget: {budget:.3f})", flush=True)


if __name__ == "__main__":
    main()
