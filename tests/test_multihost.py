"""True multi-process distributed tests: two jax processes (Gloo-backed CPU
collectives) form one 4-device mesh, gather metrics, and run a sharded
training step with cross-process gradient psum — the multi-host path that
single-process mesh simulation can't exercise."""

import json
import os
import subprocess
import sys
from os import path

import numpy as np
import pytest

REPO = path.dirname(path.dirname(path.abspath(__file__)))

WORKER = r'''
import json, os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
ffpp_root = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["DFD_VIDEO_BACKEND"] = "opencv"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
import numpy as np
sys.path.insert(0, REPO)
sys.path.insert(0, REPO + "/tests")
from fixtures import ffpp_config, tiny_detector
from dfd_clip_tpu.data.datasets import FFPP
from dfd_clip_tpu.engine import Trainer
from dfd_clip_tpu.runtime import MeshRuntime

runtime = MeshRuntime()
assert runtime.num_processes == 2
det = tiny_detector()
ds = FFPP(ffpp_config(ffpp_root), num_frames=4, clip_duration=2,
          runtime=runtime, split="train", index=0, seed=0)
cfg = Trainer.get_default_config()
cfg.max_steps = 1
cfg.batch_size = 2  # per replica x 4 devices = global 8
cfg.num_workers = 0
trainer = Trainer(cfg, runtime, det, [ds], seed=0)
trainer.run()
losses = {k: np.asarray(v).tolist() for k, v in trainer.batch_losses.items()}
# post-update parameter checksum: the psum-synced step must leave every
# rank with bit-identical weights
checksum = float(sum(
    np.float64(np.sum(np.asarray(l))) for l in jax.tree_util.tree_leaves(trainer.trainable)
))
with open(out_path, "w") as f:
    json.dump({"proc": proc_id, "devices": jax.device_count(),
               "losses": losses, "checksum": checksum}, f)
'''.replace("REPO", repr(REPO))


@pytest.mark.skipif(os.environ.get("DFD_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_training_step(tmp_path, monkeypatch):
    from fixtures import make_ffpp_tree

    monkeypatch.chdir(tmp_path)
    root = make_ffpp_tree(str(tmp_path / "ffpp"))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    port = "9923"
    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port,
             str(tmp_path / f"out{i}.json"), root],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-2000:]

    results = [json.load(open(tmp_path / f"out{i}.json")) for i in range(2)]
    assert all(r["devices"] == 4 for r in results)
    # each rank reports its local 4-sample loss shard
    a = np.asarray(results[0]["losses"]["deepfake/ffpp"])
    b = np.asarray(results[1]["losses"]["deepfake/ffpp"])
    assert a.shape == (4,) and b.shape == (4,)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # the psum-synced update leaves both ranks with identical weights
    assert results[0]["checksum"] == results[1]["checksum"]
