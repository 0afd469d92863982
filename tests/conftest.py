"""Test configuration: run on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-device sharding tests use XLA's
host-platform device virtualization.
"""

import os

# force CPU: the ambient env sets up the axon TPU plugin whose sitecustomize
# overrides jax_platforms via jax.config (env vars alone are NOT enough) —
# tests need the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# persistent compile cache makes repeated test runs dramatically faster
# (repo-local: survives /tmp cleanup between sessions)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
