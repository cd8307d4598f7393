#!/usr/bin/env python3
"""VPU roofline for the DNA roll contraction — what bounds the flagship's
~1.8 ms full-tree eval?

The fused DNA score kernel's inner loop is the VPU cyclic-roll
contraction (ops/clv_pallas.py make_contract, impl="vpu"): per child it
executes ``states`` broadcast-multiply(+roll)(+add) passes over a
[C·S, bl] f32 tile, i.e. 4 multiplies + 3 adds + 3 sublane rolls per
element per child.  After round 2's nibble tip decode the kernel is past
the 531 GB/s HBM streaming ceiling (BASELINE.md), so the bound moved to
the VPU; this script measures that bound directly:

1. ``vpu_fma_peak`` — sustained f32 multiply-add element throughput,
   at two tile sizes: [16, 512] (32 KB — register-resident, the pure
   ALU rate) and [16, 4096] (256 KB — streams through VMEM each
   iteration, the rate the real kernel's VMEM-resident node sweep can
   actually tap).
2. ``roll_contract_sustained`` — the *exact* contraction loop (rolls
   included) on VMEM-resident data, no HBM traffic, no scaling, no
   product/weights: the speed-of-light for the kernel's dominant op.
3. The flagship kernel's implied VPU element-op rate, for the achieved
   fraction.

Methodology: the repetition loop lives INSIDE one pallas_call as a
``fori_loop`` serialized through the carry, with the long chain sized
so its differenced signal is ~20 ms (one iteration is only ~460 Kflop;
anything that leaves the differenced signal near the platform's ~ms
dispatch noise produced run-to-run swings of 2-20x, including negative
rates, in earlier cuts of this script).  The carried tile is W=8 blocks
WIDE ([16, 4096]) so each iteration contains 64 independent (8,128)
vector chunks and the VPU pipeline stays full (a single narrow
serialized chain measures latency, not throughput).  Two chain lengths
are timed as interleaved pairs and differenced, so dispatch + warm-up
cost cancels and drift is suppressed (bench.py round-4 methodology).
Measured 2026-08-19 (two consecutive runs): register FMA 4.29/5.03,
VMEM-streaming FMA 1.62/1.66, roll contraction 1.29/1.29 Tflop/s —
the ceiling relevant to the kernel (which streams CLVs through VMEM)
is the 1.29 number, and it is stable.

Usage: python scripts/bench_vpu_roofline.py
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS, BL = 16, 512  # [C*S, bl] working tile of the 4-state kernel
W = 8             # carried tile is W blocks wide (pipeline ILP)
K1, K2 = 1 << 13, 1 << 19
PAIRS = 9


def _chain_rate(make_kernel, flops_per_iter, *args, k1=K1, k2=K2):
    """Per-iteration time via two in-kernel chain lengths, interleaved
    pairs, median of differences."""
    f1, f2 = make_kernel(k1), make_kernel(k2)
    float(np.asarray(f1(*args)).ravel()[0])  # compile + warm
    float(np.asarray(f2(*args)).ravel()[0])

    def once(f):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        return time.perf_counter() - t0

    dts = []
    for i in range(PAIRS):
        if i % 2 == 0:
            a, b = once(f1), once(f2)
        else:
            b, a = once(f2), once(f1)
        dts.append((b - a) / (k2 - k1))
    return flops_per_iter / statistics.median(dts)


def vpu_fma_peak(w=W):
    """Sustained multiply-add chain: 2 flops/element/iter over
    [CS, BL*w]."""
    x = jnp.asarray(np.random.default_rng(0).uniform(0.9, 1.1, (CS, BL * w)),
                    jnp.float32)

    def make(k):
        def kernel(x_ref, o_ref):
            x = x_ref[:]
            c = x_ref[0, 0]

            def body(_, acc):
                return acc * c + x

            o_ref[:] = jax.lax.fori_loop(0, k, body, x)

        @jax.jit
        def f(x):
            r = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
                (CS, BL * w), jnp.float32))(x)
            return jnp.sum(r[0, :1])
        return f

    return _chain_rate(make, 2 * CS * BL * w, x)


def roll_contract_sustained(states=4, rate_cats=4):
    """The exact make_contract(impl="vpu") loop, VMEM-resident: per
    iteration one child contraction = S muls + (S-1) adds + (S-1) rolls
    per element; counted as 2·S-1 flops/element (rolls are data
    movement, not flops — the measured rate already pays for them)."""
    cs = states * rate_cats
    x0 = jnp.asarray(np.random.default_rng(1).uniform(0.9, 1.1,
                                                      (cs, BL * W)),
                     jnp.float32)
    coeff = jnp.asarray(np.random.default_rng(2).uniform(0.2, 0.3,
                                                         (cs, states)),
                        jnp.float32)

    def make(k):
        def kernel(x_ref, c_ref, o_ref):
            c = c_ref[:]

            def body(_, x):
                acc = c[:, 0:1] * x
                for d in range(1, states):
                    shift = int((cs - d * rate_cats) % cs)
                    acc = acc + c[:, d:d + 1] * pltpu.roll(x, shift, 0)
                # renormalize: keeps values bounded AND serializes iters
                return acc * (1.0 / (states * 0.25))

            o_ref[:] = jax.lax.fori_loop(0, k, body, x_ref[:])

        @jax.jit
        def f(x, c):
            r = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
                (cs, BL * W), jnp.float32))(x, c)
            return jnp.sum(r[0, :1])
        return f

    return _chain_rate(make, (2 * states - 1) * cs * BL * W, x0, coeff)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    fma_reg = vpu_fma_peak(w=1)
    print(f"VPU f32 FMA sustained (register-resident [16,512] tile): "
          f"{fma_reg/1e12:.2f} Tflop/s", flush=True)
    fma = vpu_fma_peak()
    print(f"VPU f32 FMA sustained (VMEM-streaming [16,{512*W}] tile): "
          f"{fma/1e12:.2f} Tflop/s", flush=True)
    roll = roll_contract_sustained()
    print(f"roll-contraction sustained (exact kernel loop, VMEM): "
          f"{roll/1e12:.2f} Tflop/s "
          f"({roll/fma*100:.0f}% of the FMA rate — the roll cost)",
          flush=True)

    # the flagship's implied rates.  Since round 5 only INNER children run
    # the roll contraction; tip children use the roll-free bit-product
    # form (ops/clv_pallas.py tip_coeff_pmatrices: S broadcast FMAs, no
    # rolls, no decode tile).  The 64-taxon flagship has 62 inner nodes
    # with 124 children of which 64 are tips -> 60 roll children + 64 tip
    # terms + 1 roll edge term.  Each class is (2S-1)*S flop per
    # pattern-cat; tip terms are bounded by the pure-FMA rate, roll
    # children by the roll-contraction rate.
    s4 = 4
    flops_pc = (2 * s4 - 1) * s4
    contr_flops = 61 * 262144 * 4 * flops_pc
    tip_flops = 64 * 262144 * 4 * flops_pc
    floor_s = contr_flops / roll + tip_flops / fma
    print(f"flagship two-class floor (61 roll children @ {roll/1e12:.2f} + "
          f"64 tip terms @ {fma/1e12:.2f} Tflop/s): {floor_s*1e3:.2f} ms",
          flush=True)
    for label, ms in (("1.38 ms band floor", 1.38),
                      ("1.53 ms median", 1.53),
                      ("1.62 ms band top", 1.62)):
        print(f"flagship at {label}: {floor_s/(ms*1e-3)*100:.0f}% of the "
              f"two-class speed of light (remainder: per-node product + "
              f"scaling checks, tip bit extracts, final weight/fold, "
              f"P-matrix loads)", flush=True)


if __name__ == "__main__":
    main()
