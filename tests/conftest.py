"""Test config: force an 8-device CPU platform so sharding tests run anywhere
(SURVEY.md §4's fake-backend layer).

Note: the environment's sitecustomize force-registers the TPU ('axon')
platform, overriding JAX_PLATFORMS env; jax.config.update after import wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
