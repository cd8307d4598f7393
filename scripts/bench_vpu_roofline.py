#!/usr/bin/env python3
"""VPU roofline for the DNA roll contraction — what bounds the flagship's
~1.7 ms full-tree eval?

The fused DNA score kernel's inner loop is the VPU cyclic-roll
contraction (ops/clv_pallas.py make_contract, impl="vpu"): per child it
executes ``states`` broadcast-multiply(+roll)(+add) passes over a
[C·S, bl] f32 tile, i.e. 4 multiplies + 3 adds + 3 sublane rolls per
element per child.  After round 2's nibble tip decode the kernel is past
the 531 GB/s HBM streaming ceiling (BASELINE.md), so the bound moved to
the VPU; this script measures that bound directly:

1. ``vpu_fma_peak`` — sustained f32 multiply-add element throughput on
   VMEM-resident [16, 512] tiles (no rolls): the chip's usable VPU flops
   for this tile shape.
2. ``roll_contract_sustained`` — the *exact* contraction loop (rolls
   included) on VMEM-resident data, no HBM traffic, no scaling, no
   product/weights: the speed-of-light for the kernel's dominant op.
3. The flagship kernel's implied VPU element-op rate, for the achieved
   fraction.

All measurements use in-kernel repetition (the k-loop lives INSIDE one
pallas_call, serialized through the accumulator), so remote-dispatch
overhead and HBM streaming are excluded by construction.

Usage: python scripts/bench_vpu_roofline.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CS, BL = 16, 512  # [C*S, bl] working tile of the 4-state kernel
REPS = 4


def _time(f, *args):
    float(np.asarray(f(*args)).ravel()[0])  # compile + warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _chain_rate(make_kernel, flops_per_iter, *args, k1=64, k2=512):
    """Per-iteration time via two in-kernel chain lengths (differences out
    the fixed dispatch + result-reduction cost)."""
    t1 = _time(make_kernel(k1), *args)
    t2 = _time(make_kernel(k2), *args)
    dt = (t2 - t1) / (k2 - k1)
    return flops_per_iter / dt


def vpu_fma_peak():
    """Sustained multiply-add chain on a VMEM tile: 2 flops/element/iter."""
    x = jnp.asarray(np.random.default_rng(0).uniform(0.9, 1.1, (CS, BL)),
                    jnp.float32)

    def make(k):
        def kernel(x_ref, o_ref):
            acc = x_ref[:]
            c = x_ref[0, 0]
            for _ in range(k):
                acc = acc * c + x_ref[:]
            o_ref[:] = acc

        @jax.jit
        def f(x):
            r = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
                (CS, BL), jnp.float32))(x)
            return jnp.sum(r[0, :1])
        return f

    return _chain_rate(make, 2 * CS * BL, x)


def roll_contract_sustained(states=4, rate_cats=4):
    """The exact make_contract(impl="vpu") loop, VMEM-resident: per
    iteration one child contraction = S muls + (S-1) adds + (S-1) rolls
    per element; counted as 2·S-1 flops/element (rolls are data movement,
    not flops — the measured rate already pays for them)."""
    cs = states * rate_cats
    x0 = jnp.asarray(np.random.default_rng(1).uniform(0.9, 1.1, (cs, BL)),
                     jnp.float32)
    coeff = jnp.asarray(np.random.default_rng(2).uniform(0.2, 0.3,
                                                         (cs, states)),
                        jnp.float32)

    def make(k):
        def kernel(x_ref, c_ref, o_ref):
            x = x_ref[:]
            for _ in range(k):
                acc = c_ref[:, 0:1] * x
                for d in range(1, states):
                    shift = np.int32((cs - d * rate_cats) % cs)
                    acc = acc + c_ref[:, d:d + 1] * pltpu.roll(x, shift, 0)
                # renormalize to keep values bounded and serialize iters
                x = acc * (1.0 / (states * 0.25))

            o_ref[:] = x

        @jax.jit
        def f(x, c):
            r = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
                (cs, BL), jnp.float32))(x, c)
            return jnp.sum(r[0, :1])
        return f

    return _chain_rate(make, (2 * states - 1) * cs * BL, x0, coeff)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    fma = vpu_fma_peak()
    print(f"VPU f32 FMA sustained (VMEM [16,512] tile): "
          f"{fma/1e12:.2f} Tflop/s", flush=True)
    roll = roll_contract_sustained()
    print(f"roll-contraction sustained (exact kernel loop, VMEM): "
          f"{roll/1e12:.2f} Tflop/s "
          f"({roll/fma*100:.0f}% of the FMA rate — the roll cost)",
          flush=True)

    # the flagship's implied rate: per site-rate update the kernel does
    # 2 children x (2S-1) flops/element over S state rows + S product +
    # ~2S weight/fold flops = (2*(2*4-1)*4 + 4 + 8) = 68 flop/update
    flop_per_update = 2 * (2 * 4 - 1) * 4 + 4 + 8
    for label, ms in (("1.67 ms band floor", 1.67), ("1.94 ms band top",
                                                     1.94)):
        upd = 62 * 262144 * 4 / (ms * 1e-3)
        print(f"flagship at {label}: {upd/1e9:.1f}e9 updates/s = "
              f"{upd*flop_per_update/1e12:.2f} Tflop/s VPU-equivalent = "
          f"{upd*flop_per_update/roll*100:.0f}% of the roll-contraction "
          f"ceiling", flush=True)


if __name__ == "__main__":
    main()
