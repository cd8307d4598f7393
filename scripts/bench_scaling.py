#!/usr/bin/env python3
"""Scaling-efficiency measurement over a sites-sharded mesh.

On TPU hardware this measures real ICI scaling; in this environment only
one chip exists, so the default run uses XLA's virtual host-platform
devices (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8) to
validate the *mechanism*: the sharded forward must produce identical logL
at every mesh size and its wall-clock should drop as devices are added
(CPU "devices" are host threads, so efficiency is indicative, not an ICI
number).

Prints one line per mesh size: devices, ms/eval, speedup vs 1 device.
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import numpy as np

sys.path.insert(0, ".")

import jax

if len(sys.argv) > 1 and sys.argv[1] == "tpu":
    pass  # keep the platform
else:
    jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from __graft_entry__ import _build_flagship
from libpll_tpu.engine.evaluate import make_forward

TIPS, SITES = 64, 65536
REPS = 5


def time_mesh(n_dev):
    devs = np.asarray(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("sites",))
    topo, model, clv, scalers = _build_flagship(TIPS, SITES)
    shard = NamedSharding(mesh, P(*([None] * 3), "sites"))
    shard2 = NamedSharding(mesh, P(None, "sites"))
    vec = NamedSharding(mesh, P("sites"))
    repl = NamedSharding(mesh, P())
    clv = jax.device_put(clv, shard)
    scalers = jax.device_put(scalers, shard2)
    model = {k: jax.device_put(
        v, vec if k in ("pattern_weights", "invariant") else repl)
        for k, v in model.items()}
    fwd = jax.jit(make_forward(topo))
    logl, _ = fwd(model, clv, scalers)
    logl.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(REPS):
        logl, _ = fwd(model, clv, scalers)
    logl.block_until_ready()
    dt = (time.perf_counter() - t0) / REPS
    return float(logl), dt * 1e3


def main():
    base = None
    print(f"config: {TIPS} taxa x {SITES} sites x 4 rate cats, "
          f"platform={jax.devices()[0].platform}")
    ref_logl = None
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        logl, ms = time_mesh(n)
        if ref_logl is None:
            ref_logl, base = logl, ms
        assert abs(logl - ref_logl) < 1e-3 * abs(ref_logl), (logl, ref_logl)
        print(f"devices={n}  {ms:8.1f} ms/eval  speedup {base / ms:5.2f}x  "
              f"efficiency {base / ms / n * 100:5.1f}%")


if __name__ == "__main__":
    main()
