"""Test configuration: run everything on a virtual 8-device CPU backend.

Tests exercise multi-chip sharding on 8 fake CPU devices (SURVEY.md §4c);
real-TPU behavior is covered by the driver's bench/dryrun. The environment's
sitecustomize force-registers the axon TPU plugin and overrides
``JAX_PLATFORMS``, so the CPU backend must be selected *after* the jax
import via ``jax.config`` — before any computation runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
