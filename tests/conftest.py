"""Test environment: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize registers a remote 'axon' TPU backend
and force-sets ``jax_platforms`` via jax.config (overriding env vars), so we
must update the config here — and we must do it before the first backend use.
"""

import os
import re

# the suite's sharding/mesh tests are written against exactly 8 virtual
# devices — REPLACE any pre-existing count (a shell with ...count=4 exported
# would otherwise silently run a different mesh shape)
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
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
