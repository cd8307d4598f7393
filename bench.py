#!/usr/bin/env python3
"""Headline benchmark: CLV updates/sec/chip on the flagship configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition (BASELINE.md): sites × rate_cats × inner-nodes updated
per second by a full-tree evaluation (`pll_update_partials` +
`pll_compute_edge_loglikelihood` throughput).  The measured path is the
fused edge-score Pallas kernel with nibble-packed pattern tips
(tip_encoding="chars": 0.5 byte/tip/site decoded in VMEM, inner CLVs never
leave VMEM, one partial sum per 128-site block to HBM) — the tree-search
fast path.

The baseline denominator is the reference's AVX2 single-core path measured
on this machine at the SAME configuration (64 taxa × 262 144 sites × 4
Γ-categories, DNA, per-site scaling, float64 — the reference's only
precision): 56.2e6 site-rate-node updates/s, 1618 ms per full-tree eval
(scripts/bench_reference.py).

Timing methodology: on this platform `block_until_ready` does not reliably
fence device work, so each measurement jits a chain of K data-dependent
evaluations ending in a scalar readback and reports (t_K − t_1)/(K − 1),
which also cancels the host→device readback latency.
"""

import json
import sys
import time

# reference AVX2, 1 core, this machine, SAME config (BASELINE.md round 2)
BASELINE_CLV_UPDATES_PER_SEC = 56.2e6

TIPS = 64
SITES = 262144
RATE_CATS = 4
STATES = 4
CHAIN = 9


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from libpll_tpu.engine import evaluate as ev
    from libpll_tpu.ops import clv_pallas as cp

    topo, model, clv, scalers = _build_flagship(TIPS, SITES,
                                                rate_cats=RATE_CATS)
    clv_np = np.asarray(clv[:TIPS])
    masks = ((clv_np[:, 0] > 0).astype(np.uint32)
             << np.arange(STATES, dtype=np.uint32)[None, :, None]).sum(1)
    score = ev.make_score(topo, RATE_CATS, STATES, impl="vpu",
                          tip_encoding="chars")
    tp = cp.pack_tipchars(masks)

    def chain(k):
        @jax.jit
        def f(model, tp):
            total = jnp.zeros((), jnp.float32)
            m = dict(model)
            for _ in range(k):
                s = score(m, tp)
                total = total + s.astype(jnp.float32)
                # serialize iterations through the branch lengths
                m["branch_lengths"] = model["branch_lengths"] + s * 1e-30
            return total
        return f

    def timeit(f, reps=5):
        float(f(model, tp))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(model, tp))
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
    print(f"# fused pattern-tip score: {dt*1e3:.2f} ms/full-tree eval for "
          f"{n_ops} ops x {SITES} sites x {RATE_CATS} rates "
          f"({TIPS} taxa, float32 vpu kernel, nibble tips); reference "
          f"AVX2 1-core same config: 1618 ms", file=sys.stderr)


if __name__ == "__main__":
    main()
