"""Multi-task training: rPPG (KL-div distribution head) + deepfake (CE head)
through one Trainer with two dataloaders — the reference's cross-task mix
recipe (configs/cross-task/mix.yaml)."""

import os
import pickle
from os import path

import numpy as np
import pytest

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.data.datasets import FFPP, RPPG
from dfd_clip_tpu.engine import Trainer
from dfd_clip_tpu.runtime import MeshRuntime

from fixtures import ffpp_config, make_ffpp_tree, tiny_detector, write_video


def make_rppg_tree(root: str, n_sessions: int = 8, fps: float = 25.0,
                   duration_s: float = 4.0):
    """MAHNOB-HCI-layout fixture with framework meta/measure pickles."""
    hr_freq = 256.0
    for i in range(n_sessions):
        sid = str(10 + i)
        session_dir = path.join(root, "Sessions", sid)
        os.makedirs(session_dir, exist_ok=True)
        video_path = path.join(session_dir, "cam.avi")
        # the cropped video actually read by the dataset:
        cropped = video_path.replace("Sessions", path.join("cropped_faces", "raw"))
        write_video(cropped, int(duration_s * fps), fps=fps, size=64, seed=50 + i)

        meta = {
            "session_dir": session_dir,
            "video_path": video_path,
            "bdf_path": path.join(session_dir, "ecg.bdf"),
            "session_video_sample_freq": fps,
            "session_video_beg_sample": 0,
            "flag_video_beg_sample": 0,
            "session_hr_sample_freq": hr_freq,
            "flag_hr_beg_sample": 0,
            "duration": duration_s,
        }
        meta_dir = path.join(root, "Metas", sid)
        os.makedirs(meta_dir, exist_ok=True)
        with open(path.join(meta_dir, "meta.pickle"), "wb") as f:
            pickle.dump(meta, f)

        ends = [int(hr_freq * t) for t in (2, 4, 6, 8)]
        measures = {"idx": ends, "data": [{"bpm": 60.0 + 5 * j} for j in range(len(ends))]}
        measure_dir = path.join(root, "Measures", sid)
        os.makedirs(measure_dir, exist_ok=True)
        with open(path.join(measure_dir, "data.pickle"), "wb") as f:
            pickle.dump(measures, f)
    return root


@pytest.fixture
def roots(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    ffpp = make_ffpp_tree(str(tmp_path / "ffpp"))
    rppg = make_rppg_tree(str(tmp_path / "hci"))
    return ffpp, rppg


def test_rppg_dataset(roots):
    _, rppg_root = roots
    cfg = RPPG.get_default_config()
    cfg.root_dir = rppg_root
    cfg.category = "rPPG"
    cfg.runtime = False
    cfg.train_ratio = 1.0
    ds = RPPG(cfg, num_frames=4, clip_duration=2, split="train", index=0)
    assert len(ds) == 16  # 8 sessions x 2 clips x 1 compression
    frames, label, mask, index = ds[0]
    assert frames.shape == (4, 3, 64, 64)
    assert label.shape == (140,)  # dist label
    assert np.isclose(label.sum(), 1.0, atol=0.01)  # ~gaussian over bins
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch[0].shape == (2, 4, 3, 64, 64)
    assert batch[1].shape == (2, 140)


def test_multitask_trainer(roots):
    ffpp_root, rppg_root = roots
    runtime = MeshRuntime()

    det = tiny_detector(out_dim=[140, 2], losses=["kl_div", "auc_roc"])

    rppg_cfg = RPPG.get_default_config()
    rppg_cfg.root_dir = rppg_root
    rppg_cfg.category = "rPPG"
    rppg_cfg.runtime = False
    rppg_cfg.train_ratio = 1.0
    rppg_ds = RPPG(rppg_cfg, num_frames=4, clip_duration=2, split="train", index=0)

    ffpp_ds = FFPP(ffpp_config(ffpp_root), num_frames=4, clip_duration=2,
                   runtime=runtime, split="train", index=1)

    tcfg = Trainer.get_default_config()
    tcfg.max_steps = 2
    tcfg.batch_size = 1 if runtime.data_parallel > 1 else 2
    tcfg.num_workers = 0
    tcfg.learning_rate = 1e-3
    trainer = Trainer(tcfg, runtime, det, [rppg_ds, ffpp_ds])
    trainer.run()

    assert trainer.steps == 2
    assert "rppg/rppg" in trainer.batch_losses
    assert "deepfake/ffpp" in trainer.batch_losses
    for v in trainer.batch_losses.values():
        assert np.isfinite(np.asarray(v)).all()


def test_multitask_teacher_mode(roots):
    """Teacher mode with two tasks: after teach_at, non-source tasks train on
    the EMA teacher's softmax pseudo-labels (reference src/trainer.py:124-137)."""
    ffpp_root, rppg_root = roots
    runtime = MeshRuntime()

    det = tiny_detector(out_dim=[140, 2], losses=["kl_div", "auc_roc"])

    rppg_cfg = RPPG.get_default_config()
    rppg_cfg.root_dir = rppg_root
    rppg_cfg.category = "rPPG"
    rppg_cfg.runtime = False
    rppg_cfg.train_ratio = 1.0
    rppg_ds = RPPG(rppg_cfg, num_frames=4, clip_duration=2, split="train", index=0)
    ffpp_ds = FFPP(ffpp_config(ffpp_root), num_frames=4, clip_duration=2,
                   runtime=runtime, split="train", index=1)

    tcfg = Trainer.get_default_config()
    tcfg.max_steps = 3
    tcfg.batch_size = 1 if runtime.data_parallel > 1 else 2
    tcfg.num_workers = 0
    tcfg.mode = "teacher"
    tcfg.mode_params.teach_at = 1
    tcfg.mode_params.ema_ratio = 0.999
    trainer = Trainer(tcfg, runtime, det, [rppg_ds, ffpp_ds])
    trainer.run()
    assert trainer.teaching
    assert trainer.steps == 3
    for v in trainer.batch_losses.values():
        assert np.isfinite(np.asarray(v)).all()


def test_category_index_first_appearance():
    """Task indices follow data.train first-appearance order (the YAML's
    losses/out_dim ordering), NOT alphabetical or set order. Regression for
    the cross-task recipe: rPPG listed first must be task 0 even though
    'Deepfake' sorts before 'rPPG'."""
    import sys
    import types
    from os import path

    sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))
    from main import category_index_map

    cfgs = [types.SimpleNamespace(category=c)
            for c in ("rPPG", "Deepfake", "rPPG")]
    assert category_index_map(cfgs) == {"rPPG": 0, "Deepfake": 1}
