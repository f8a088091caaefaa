"""Test config: run on a virtual 8-device CPU mesh (no TPU needed).

Mirrors the driver's multi-chip dry-run environment: JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8 so sharding tests exercise real
Mesh/shard_map paths.
"""

import os

# The sandbox pins JAX_PLATFORMS=axon (TPU via network tunnel) and a
# sitecustomize that imports jax early, so override unconditionally AND via
# jax.config (env alone is read before we run).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
