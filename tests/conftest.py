"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a virtual CPU mesh (the driver's
dryrun does the same); real-TPU benchmarking happens in bench.py only.

Note: this environment boots with a sitecustomize that registers a remote
TPU backend and forces ``jax_platforms``; ``jax.config.update`` after import
(but before first backend use) wins over both, so tests never touch the
real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
