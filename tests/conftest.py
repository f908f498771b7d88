"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): the numpy/scipy oracle
is the executable spec; tests are deterministic on CPU. Multi-chip sharding
is exercised with ``--xla_force_host_platform_device_count=8`` — the
TPU-world answer to "test multi-device without a cluster". The environment
variables MUST be set before jax is imported anywhere.
"""
import os

# The sandbox pins JAX_PLATFORMS=axon (TPU) and pre-imports jax from
# sitecustomize, so env vars alone don't stick — use jax.config. Tests run
# on CPU for determinism and the virtual 8-device mesh. Override with
# INDIGO_TEST_PLATFORM=axon to run the suite on real TPU hardware.
_platform = os.environ.get("INDIGO_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
