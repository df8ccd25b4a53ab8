"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform flags before jax initializes (SURVEY.md §4: multi-host
logic is tested with xla_force_host_platform_device_count mesh simulation).
"""

import os

# Force (not setdefault): the harness may pre-set JAX_PLATFORMS to the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the env var; force through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite compiles many tiny programs; cache them.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
