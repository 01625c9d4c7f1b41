"""Test configuration.

Runs the whole suite on CPU with 8 virtual devices so multi-chip
sharding (``jax.sharding.Mesh``) is exercised without TPU hardware —
the strategy SURVEY.md §4 prescribes (the reference has no distributed
tests to model this on).  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image's sitecustomize registers the TPU (axon) backend at interpreter
# start, so the env var alone is too late — force the platform via config.
jax.config.update("jax_platforms", "cpu")

# x64 lets algorithm-parity tests compare against float64 oracles exactly;
# production precision (f32/bf16) is covered by dedicated tolerance tests.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
