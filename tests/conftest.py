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
# The suite is compile-bound (~300 s of XLA:CPU compiles); a persistent
# compile cache cuts repeat runs to the actual test work.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
