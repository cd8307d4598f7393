"""Test configuration: run everything on a virtual 8-device CPU mesh.

Parity with the reference demands float64, and multi-chip sharding is
validated without TPU hardware via XLA's host-platform device splitting —
the pattern the driver's ``dryrun_multichip`` also uses.
"""

import os

# Parity tests need float64 and determinism: always run on host CPU unless a
# TPU run is explicitly requested (LIBPLL_TEST_TPU=1).
if not os.environ.get("LIBPLL_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported by the interpreter's sitecustomize with the
# environment's platform (e.g. a TPU plugin); override via config too.
if not os.environ.get("LIBPLL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
