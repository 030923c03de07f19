"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the multi-host test strategy from SURVEY.md section 4: the same SPMD
programs must run on a virtual CPU mesh so sharding is validated without real
chips.

This environment ships a sitecustomize that registers a remote TPU PJRT
plugin and pins `jax_platforms="axon,cpu"` at interpreter start. Tests flip
the config back to pure CPU *before* the CPU client is instantiated; the
XLA_FLAGS env var must also be set before that instantiation for the 8
virtual devices to appear.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Fresh per-test generator: draws don't depend on test execution order.
    return np.random.default_rng(0)
