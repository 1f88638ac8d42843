"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8`` (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize registers the TPU ('axon') backend and overrides
# JAX_PLATFORMS via jax.config — force CPU here so the 8-device virtual mesh
# is available and tests don't contend for the single TPU chip.
jax.config.update("jax_platforms", "cpu")

# Tests verify numerics against NumPy references — use full precision for
# jnp matmuls/einsums (library blocks that intend bf16 cast explicitly).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
