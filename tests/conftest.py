"""Test configuration: force CPU with 8 virtual devices.

The environment's sitecustomize registers and pins the axon TPU platform in
every interpreter (env JAX_PLATFORMS=axon, jax already imported at
interpreter start), so an env-var setdefault is not enough: we must override
the jax config directly. The CPU client is created lazily, so setting
XLA_FLAGS here still yields 8 virtual devices for sharding tests.
Real-TPU perf is exercised only by bench.py.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
