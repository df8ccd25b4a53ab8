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
