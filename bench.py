#!/usr/bin/env python3
"""Headline benchmark: CLV updates/sec/chip on the flagship configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.md): sites × rate_cats × inner-nodes updated per
second by the full pruning sweep (`pll_update_partials` throughput). The
baseline denominator is libpll's AVX2 single-core path measured on the host
CPU of this environment (see BASELINE.md): 100.9e6 site-rate updates/s at
64 taxa × 50k sites × 4 rate categories, DNA, per-site scaling.

The TPU run uses the fused Pallas sweep (float32 fast path, 2**64-unit
scaling counters), 64 taxa × 4 Γ-categories × 256k sites.

Timing methodology: on this platform `block_until_ready` does not reliably
fence device work, so each measurement jits a chain of K data-dependent
sweeps ending in a scalar readback and reports (t_K − t_1)/(K − 1), which
also cancels the host→device readback latency.
"""

import json
import sys
import time

# libpll AVX2, 1 core, this machine (see BASELINE.md "measured baseline")
BASELINE_CLV_UPDATES_PER_SEC = 100.9e6

TIPS = 64
SITES = 262144
RATE_CATS = 4
STATES = 4
CHAIN = 9


def main() -> None:
    import jax

    from __graft_entry__ import _build_flagship
    from libpll_tpu.engine.evaluate import _pmatrices
    from libpll_tpu.ops import clv_pallas as cp

    topo, model, clv, scalers = _build_flagship(TIPS, SITES,
                                                rate_cats=RATE_CATS)
    pmatrix = _pmatrices(model, topo, clv.dtype)
    sweep = cp.make_fused_sweep(topo.schedule, topo.scale_mode,
                                rate_cats=RATE_CATS, states=STATES)
    tips_packed = jax.jit(lambda x: cp.pack_tips(x, "vpu"))(clv[:TIPS])

    def chain(k):
        @jax.jit
        def f(tp, pmat):
            inner = None
            for _ in range(k):
                inner, _ = sweep(tp, pmat)
                tp = tp + inner[0, 0, 0] * 1e-30  # serialize iterations
            return inner[-1, 0, 0]
        return f

    def timeit(f, reps=5):
        float(f(tips_packed, pmatrix))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(tips_packed, pmatrix))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timeit(chain(1))
    tk = timeit(chain(CHAIN))
    dt = (tk - t1) / (CHAIN - 1)

    n_ops = TIPS - 2
    updates = n_ops * SITES * RATE_CATS
    rate = updates / dt
    print(json.dumps({
        "metric": "CLV updates/sec/chip",
        "value": rate,
        "unit": "site-rate-node updates/s",
        "vs_baseline": rate / BASELINE_CLV_UPDATES_PER_SEC,
    }))
    print(f"# fused sweep {dt*1e3:.2f} ms for {n_ops} ops x {SITES} sites x "
          f"{RATE_CATS} rates ({TIPS} taxa, float32 vpu kernel)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
