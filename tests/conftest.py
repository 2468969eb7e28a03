"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX fake-backend trick for testing pjit/shard_map mesh
code without TPU hardware (SURVEY.md §4). jax may already be imported by the
interpreter's sitecustomize, so we must go through jax.config (env vars are
latched at jax import time); XLA_FLAGS is still read at backend-init time,
which has not happened yet when conftest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
