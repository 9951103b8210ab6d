"""Test configuration: force CPU with 8 virtual devices.

This is the JAX-native "fake backend" for exercising multi-chip sharding without a TPU
slice (SURVEY.md §4): ``--xla_force_host_platform_device_count=8`` gives tests a real
8-device mesh on the host.

Note: this image boots an `axon` TPU PJRT plugin from sitecustomize.py which overrides
the JAX_PLATFORMS env var via jax.config, so we must force the platform through
``jax.config.update`` (env alone is not enough), before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
