"""Test env: force an 8-device CPU platform BEFORE any computation.

This is the TPU-native answer to "test distributed code without a cluster"
(SURVEY §4c): every sharding/collective path runs on 8 virtual CPU devices.

Note: this environment's TPU plugin (axon) overrides JAX_PLATFORMS through
jax.config at interpreter startup, so the env var alone is not enough — we
must update jax.config after import, before the backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
