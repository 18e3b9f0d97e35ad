"""Test harness: force an 8-device virtual CPU mesh before any jax use.

Exercises multi-chip sharding (mesh/pjit/shard_map paths) without TPU
hardware, per SURVEY.md §4's recommended strategy. The ambient environment
registers a TPU-tunnel ("axon") backend for every interpreter, so plain
``JAX_PLATFORMS=cpu`` is not enough -- the jax config must be updated
explicitly before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.RandomState(0)
