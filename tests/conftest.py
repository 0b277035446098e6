"""Test configuration: run everything on an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4 implication
(d): multi-device tests without a cluster via host platform device count).
"""

import os

# Force CPU regardless of the session backend (the axon TPU tunnel is for
# bench only; tests run on an 8-device virtual CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The session env pins JAX_PLATFORMS=axon (TPU tunnel); something in the
# interpreter re-applies it after env mutation, so override via jax.config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(500)
