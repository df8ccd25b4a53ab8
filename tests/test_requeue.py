"""SLURM requeue recipe: kill a training run mid-flight, relaunch, converge.

The reference resubmits via submitit's `checkpoint()` hook
(/root/reference/dinov2/run/train/train.py:28-33). This framework instead
relies on (a) `trainer.checkpoint_interval` + a STABLE `trainer.
checkpoint_dir` (the run-dir default is timestamped and would fork on
requeue), and (b) `sbatch --requeue`: the requeued attempt finds the latest
`step_*` checkpoint and continues the data stream exactly where it died.
docs/MULTIHOST.md §Requeue documents the recipe; this test simulates it:
SIGKILL after the first checkpoint lands, relaunch the same command under
the same fake-SLURM env, and require the final weights to be bit-identical
to an uninterrupted run.
"""

import os
import pickle
import signal
import stat
import subprocess
import sys
import time
from os import path

import numpy as np
import pytest
import yaml

sys.path.insert(0, path.dirname(__file__))

from fixtures import make_ffpp_tree  # noqa: E402

REPO = path.dirname(path.dirname(path.abspath(__file__)))


def _write_cfg(tmp_path, ffpp_root, tag, max_steps=6):
    cfg = {
        "system": {
            "mixed_precision": "no",
            "seed": 0,
            "deterministic_training": True,
            "training_eval_interval": 100,
            "evaluation_interval": 100,
        },
        "tracking": {
            "enabled": True,
            "directory": str(tmp_path / f"logs_{tag}"),
            "project_name": "requeue",
            "main_metric": "deepfake/ffpp/roc_auc",
            "compare_fn": "max",
        },
        "model": {
            "name": "Detector",
            "foundation": "clip",
            "architecture": "ViT-Test",
            "decode_mode": "index",
            "decode_indices": [0, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
            "dropout": 0.0,
        },
        "trainer": {
            "name": "Trainer",
            "batch_size": 2,
            "num_workers": 0,
            "learning_rate": 1e-3,
            "max_steps": max_steps,
            # the requeue contract: a STABLE checkpoint_dir + an interval
            "checkpoint_interval": 2,
            "checkpoint_dir": str(tmp_path / f"ckpt_{tag}"),
            "metrics": [
                {"name": "deepfake/ffpp", "types": ["accuracy", "roc_auc"]}
            ],
        },
        "evaluator": {
            "name": "Evaluator",
            "batch_size": 4,
            "num_workers": 0,
            "metrics": [
                {"name": "deepfake/ffpp", "types": ["accuracy", "roc_auc"]}
            ],
        },
        "data": {
            "num_frames": 4,
            "clip_duration": 2,
            "train": [{
                "name": "FFPP", "category": "Deepfake",
                "root_dir": ffpp_root, "types": ["REAL", "DF"],
                "compressions": ["raw"], "augmentation": "none",
            }],
            "eval": [{
                "name": "FFPP", "category": "Deepfake",
                "root_dir": ffpp_root, "types": ["REAL", "DF"],
                "compressions": ["raw"],
            }],
        },
    }
    p = tmp_path / f"{tag}.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def _slurm_env(tmp_path):
    """Single-task fake-SLURM environment: launch.initialize() goes through
    the real slurm_env() parse (runtime/launch.py:23-38) with a stub
    scontrol, exactly like a 1-node `srun python main.py`."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    scontrol = bindir / "scontrol"
    scontrol.write_text("#!/bin/sh\necho 127.0.0.1\n")
    scontrol.chmod(scontrol.stat().st_mode | stat.S_IEXEC)
    env = dict(
        os.environ,
        PATH=f"{bindir}:{os.environ['PATH']}",
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        DFD_VIDEO_BACKEND="opencv",
        SLURM_JOB_ID="4242",
        SLURM_JOB_NODELIST="localhost",
        SLURM_NTASKS="1",
        SLURM_PROCID="0",
    )
    env.pop("XLA_FLAGS", None)  # single device is enough and compiles faster
    return env


def _run(cfg, env, cwd):
    return subprocess.run(
        [sys.executable, path.join(REPO, "main.py"), "--cfg", cfg],
        env=env, cwd=cwd, capture_output=True, text=True, timeout=600)


def _last_weights(tmp_path, tag):
    runs = sorted(
        (tmp_path / f"logs_{tag}" / "requeue").glob("*/last_weights.pt"),
        key=lambda p: p.stat().st_mtime)
    assert runs, f"no completed run under logs_{tag}"
    with open(runs[-1], "rb") as f:
        return pickle.load(f)


def test_slurm_requeue_kill_and_resume(tmp_path):
    ffpp_root = make_ffpp_tree(str(tmp_path / "ffpp"))
    env = _slurm_env(tmp_path)

    # reference run: uninterrupted 6 steps
    cfg_a = _write_cfg(tmp_path, ffpp_root, "a")
    res = _run(cfg_a, env, str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    ref = _last_weights(tmp_path, "a")

    # victim run: SIGKILL as soon as the first step_* checkpoint lands
    cfg_b = _write_cfg(tmp_path, ffpp_root, "b")
    ckpt_dir = tmp_path / "ckpt_b"
    proc = subprocess.Popen(
        [sys.executable, path.join(REPO, "main.py"), "--cfg", cfg_b],
        env=env, cwd=str(tmp_path),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 420
        while time.time() < deadline:
            done = [d for d in (ckpt_dir.glob("step_*") if ckpt_dir.is_dir()
                                else []) if not d.name.endswith(".tmp")]
            if done:
                break
            if proc.poll() is not None:
                pytest.fail(f"victim exited early with {proc.returncode}")
            time.sleep(0.25)
        else:
            pytest.fail("no checkpoint appeared before the kill deadline")
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    # the requeued attempt: same command, same env (sbatch --requeue)
    res = _run(cfg_b, env, str(tmp_path))
    assert res.returncode == 0, res.stderr[-2000:]
    requeued = _last_weights(tmp_path, "b")

    # deterministic training + data-stream-continuing resume => the requeued
    # run's final weights equal the uninterrupted run's, bit for bit
    flat_ref, _ = _flatten(ref)
    flat_req, _ = _flatten(requeued)
    assert flat_ref.keys() == flat_req.keys()
    for k in flat_ref:
        np.testing.assert_array_equal(
            flat_ref[k], flat_req[k], err_msg=f"weight mismatch at {k}")


def _flatten(tree, prefix=""):
    out = {}
    meta = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            sub, m = _flatten(v, f"{prefix}/{k}")
            out.update(sub)
            meta += m
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            sub, m = _flatten(v, f"{prefix}/{i}")
            out.update(sub)
            meta += m
    else:
        out[prefix] = np.asarray(tree)
    return out, meta
