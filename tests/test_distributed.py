"""Two-process jax.distributed smoke test on CPU: both processes join one
coordinator, build a global sites mesh spanning each process's virtual
devices, run the sharded XLA forward, and must agree on the (replicated)
log-likelihood — the DCN-side bring-up path of parallel/mesh.py
(SURVEY §5.8)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
import jax
jax.config.update("jax_platforms", "cpu")

from libpll_tpu.parallel.mesh import initialize_distributed

addr, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(addr, 2, pid)
assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 4, len(devs)  # 2 procs x 2 virtual devices

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from __graft_entry__ import _build_flagship
from libpll_tpu.engine.evaluate import make_forward

mesh = Mesh(np.asarray(devs), ("sites",))
sites = 16 * len(devs)
topo, model, clv, scalers = _build_flagship(tips=8, sites=sites)
shard = NamedSharding(mesh, P(*([None] * 3), "sites"))
shard2 = NamedSharding(mesh, P(None, "sites"))
vec = NamedSharding(mesh, P("sites"))
repl = NamedSharding(mesh, P())

def put(x, s):
    return jax.make_array_from_callback(
        x.shape, s, lambda idx: np.asarray(x)[idx])

clv = put(clv, shard)
scalers = put(scalers, shard2)
model = {k: put(v, vec if k in ("pattern_weights", "invariant") else repl)
         for k, v in model.items()}

fwd = jax.jit(make_forward(topo))
logl, _ = fwd(model, clv, scalers)
print(f"RESULT {pid} {float(logl):.10f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_forward(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, str(script), addr, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        env=env, cwd=os.getcwd(), text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed smoke test timed out in this sandbox")
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, val = line.split()
                results[int(pid)] = float(val)
    assert len(results) == 2, f"workers failed:\n{outs[0]}\n---\n{outs[1]}"
    assert results[0] == results[1]
    import numpy as np
    assert np.isfinite(results[0])
