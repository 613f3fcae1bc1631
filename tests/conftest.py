"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device collectives (pjit/shard_map) are exercised without TPU hardware
via 8 virtual CPU devices (SURVEY §4 implication).

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU plugin), so setting ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars
here is too late — use ``jax.config.update`` instead, which takes effect at
first backend use.
"""

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
