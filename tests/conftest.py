"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py and the driver's compile checks.

The session environment boots an ``axon`` TPU-tunnel PJRT plugin from
sitecustomize and pins ``jax_platforms="axon,cpu"`` through the jax
config (which wins over the JAX_PLATFORMS env var), so tests must both
set the env *and* update the config before the first backend
initialisation.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (sitecustomize has usually imported it already)

jax.config.update("jax_platforms", "cpu")

# Never write bytecode next to the read-only reference checkout.
sys.dont_write_bytecode = True

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
