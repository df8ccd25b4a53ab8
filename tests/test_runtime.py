"""Launch bootstrap tests (runtime/launch.py): arg/env/SLURM precedence."""

import jax
import pytest

from dfd_clip_tpu.runtime import launch


@pytest.fixture
def capture_init(monkeypatch):
    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda *a, **kw: calls.append((a, kw)),
    )
    return calls


def test_single_process_no_env(monkeypatch, capture_init):
    for var in ("JAX_COORDINATOR_ADDRESS", "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert launch.initialize() is False
    assert capture_init == []


def test_explicit_args(monkeypatch, capture_init):
    monkeypatch.delenv("SLURM_JOB_ID", raising=False)
    assert launch.initialize("h0:1234", num_processes=2, process_id=1) is True
    assert capture_init[0][1] == {
        "coordinator_address": "h0:1234", "num_processes": 2, "process_id": 1,
    }


def test_slurm_fills_missing_but_rank0_arg_wins(monkeypatch, capture_init):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(
        launch, "slurm_env",
        lambda: {"coordinator_address": "node0:8476",
                 "num_processes": 4, "process_id": 3},
    )
    # explicit rank 0 (falsy!) must NOT be clobbered by the SLURM rank
    assert launch.initialize(process_id=0) is True
    assert capture_init[0][1] == {
        "coordinator_address": "node0:8476", "num_processes": 4, "process_id": 0,
    }


def test_env_coordinator(monkeypatch, capture_init):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "c:1")
    assert launch.initialize(num_processes=2, process_id=1) is True
    assert capture_init[0][1]["coordinator_address"] == "c:1"


# -- process-mesh registration scoping ---------------------------------------

def test_mesh_registration_scoping():
    """MeshRuntime self-registers its mesh in the process-global slot; the
    scoping helpers must restore/clear it so a stale multi-device mesh
    cannot reroute later single-stream work through shard_map."""
    from dfd_clip_tpu.runtime import mesh as mesh_rt

    base = mesh_rt.current_mesh()

    # context-managed runtime: registered inside, cleared on exit
    with mesh_rt.MeshRuntime() as rt:
        assert mesh_rt.current_mesh() is rt.mesh
    assert mesh_rt.current_mesh() is None

    # deactivate() is a no-op when another runtime has since taken over
    rt1 = mesh_rt.MeshRuntime()
    rt2 = mesh_rt.MeshRuntime(seq_parallel=2)
    rt1.deactivate()
    assert mesh_rt.current_mesh() is rt2.mesh
    rt2.deactivate()
    assert mesh_rt.current_mesh() is None

    # active_mesh restores the previous registration, exception-safe
    mesh_rt.set_current_mesh(rt1.mesh)
    with pytest.raises(RuntimeError):
        with mesh_rt.active_mesh(rt2.mesh):
            assert mesh_rt.current_mesh() is rt2.mesh
            raise RuntimeError("boom")
    assert mesh_rt.current_mesh() is rt1.mesh

    mesh_rt.set_current_mesh(base)  # the autouse fixture also restores


def test_shard_local_batch_axis1():
    """shard_local_batch places a (crops, B, ...) batch sharded over the
    data axis at axis 1 (the SSL trainer's batch layout): every device gets
    B/dp rows, and values round-trip exactly."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from dfd_clip_tpu.runtime import MeshRuntime

    rt = MeshRuntime()
    dp = rt.data_parallel
    x = np.arange(2 * dp * 4 * 3, dtype=np.float32).reshape(2, dp * 4, 3)
    arr = rt.shard_local_batch(x, batch_axis=1)
    assert arr.shape == x.shape
    assert arr.sharding.spec == P(None, "data")
    shard_rows = {s.data.shape[1] for s in arr.addressable_shards}
    assert shard_rows == {4}
    np.testing.assert_array_equal(np.asarray(arr), x)
    rt.deactivate()
