"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This image injects an `axon` TPU platform via sitecustomize (PYTHONPATH),
which imports jax at interpreter startup and routes compiles through a
slow remote service — so env-var platform selection is too late.  Setting
the platform through jax.config before any backend is initialized works
and keeps the whole suite on fast local CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon remote-compile service hooks EVERY XLA compile (CPU
# included) when these are set; if the device relay is down, the first
# jit in any test — or any CLI subprocess a test spawns — hangs
# forever.  Tests are CPU-only by design, so compile locally and stay
# hermetic against relay outages (subprocesses inherit the cleared
# env).  BWAMEM_DEVICE_TESTS=1 keeps the vars so the on-hardware
# gates (tests/test_mosaic_tpu.py subprocesses) can reach the TPU:
#   BWAMEM_DEVICE_TESTS=1 pytest tests/test_mosaic_tpu.py
# — everything else still pins itself to CPU via jax.config below, so
# only tests that spawn their own un-pinned subprocesses see the chip.
# Never set it for the full suite while a device run is in flight (the
# TPU is single-tenant).
if not os.environ.get("BWAMEM_DEVICE_TESTS"):
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
