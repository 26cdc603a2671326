"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-device sharding paths
(mesh/pjit/shard_map) are exercised without TPU hardware.

NOTE: this environment pins ``JAX_PLATFORMS=axon`` (a TPU tunnel platform) and
overriding the env var is ignored — the only reliable way to force CPU is the
``jax_platforms`` config API, which must run before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Exact fp32 matmuls for golden-parity checks (TPU-style reduced precision is
# the default otherwise).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
