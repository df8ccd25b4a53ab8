"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set platform flags before jax initializes (SURVEY.md §4: multi-host
logic is tested with xla_force_host_platform_device_count mesh simulation).
"""

import os

# Force (not setdefault): the harness may pre-set JAX_PLATFORMS to the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU's in-process collectives abort() the whole process when a
    # participant thread is starved past a hard 40 s rendezvous timeout —
    # routine on this 1-core host when 8 virtual devices each run tens of
    # seconds of compute between collectives (observed: the flagship dryrun
    # stage died with "Termination timeout ... Exiting to ensure a consistent
    # program state"). Raise both rendezvous timeouts well past any honest
    # compute imbalance; hangs stay bounded by the test/driver timeout.
    flags = (
        flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags.strip()

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


@pytest.fixture(autouse=True)
def _isolate_process_mesh():
    """Snapshot/restore the process-mesh registration around every test: a
    test that builds a MeshRuntime (which self-registers) must not reroute
    later tests' encoder/decoder calls through shard_map over its mesh."""
    from dfd_clip_tpu.runtime import mesh as mesh_rt

    prev = mesh_rt.current_mesh()
    yield
    mesh_rt.set_current_mesh(prev)
