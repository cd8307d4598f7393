#!/usr/bin/env python3
"""Headline benchmark: CLV updates/sec/chip on the flagship configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.md): sites × rate_cats × inner-nodes updated per
second by the full pruning sweep (`pll_update_partials` throughput). The
baseline denominator is libpll's AVX2 single-core path measured on the host
CPU of this environment (see BASELINE.md): 100.9e6 site-rate updates/s at
64 taxa × 50k sites × 4 rate categories, DNA, per-site scaling.

The TPU run uses the float32 fast path (2**64-unit scaling counters), 64
taxa × 4 Gamma categories and a site count sized to the chip's HBM.
"""

import json
import sys
import time

import numpy as np

# libpll AVX2, 1 core, this machine (see BASELINE.md "measured baseline")
BASELINE_CLV_UPDATES_PER_SEC = 100.9e6

TIPS = 64
SITES = 262144
RATE_CATS = 4
REPS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from libpll_tpu.engine.evaluate import _pmatrices
    from libpll_tpu.ops.sweep import make_level_sweep

    topo, model, clv, scalers = _build_flagship(TIPS, SITES,
                                                rate_cats=RATE_CATS)
    pmatrix = _pmatrices(model, topo, clv.dtype)

    sweep = jax.jit(make_level_sweep(topo.schedule, topo.scale_mode),
                    donate_argnums=(0, 1))

    # warmup/compile; chain outputs back as inputs (buffers are donated)
    bufs = sweep(clv, scalers, pmatrix)
    # force completion: a tiny readback that depends on the whole sweep
    float(bufs[0][-1].sum())

    t0 = time.perf_counter()
    for _ in range(REPS):
        bufs = sweep(bufs[0], bufs[1], pmatrix)
    float(bufs[0][-1].sum())
    dt = (time.perf_counter() - t0) / REPS

    n_ops = (TIPS - 2)
    updates = n_ops * SITES * RATE_CATS
    rate = updates / dt
    print(json.dumps({
        "metric": "CLV updates/sec/chip",
        "value": rate,
        "unit": "site-rate-node updates/s",
        "vs_baseline": rate / BASELINE_CLV_UPDATES_PER_SEC,
    }))
    print(f"# sweep {dt*1e3:.2f} ms for {n_ops} ops x {SITES} sites x "
          f"{RATE_CATS} rates ({TIPS} taxa, float32)", file=sys.stderr)


if __name__ == "__main__":
    main()
