"""mp4v-vs-FFV1 crop-storage ablation (round-1 verdict, weak #4).

The reference stores preprocessed face crops losslessly in FFV1
(/root/reference/preprocessing/extract_single_aligned_face.py:152-173); this
framework defaults to MPEG-4 for a ~60x decode win (PERF.md) with
``--codec ffv1`` as the escape hatch. Deepfake signal is
compression-sensitive, so quantify the risk on the separable fixtures: train
the scoring path on mp4v-stored crops, then evaluate the SAME held-out
source content stored under each codec — the detection signal (AUROC) must
survive mp4v storage AND a c23-style recompression of the crops.
"""

import json
import os
from os import path

import numpy as np
import pytest

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.data.datasets import FFPP
from dfd_clip_tpu.engine import Evaluator, Trainer
from dfd_clip_tpu.engine.callbacks import (
    compute_metrics,
    init_metrics,
    update_metrics,
)
from dfd_clip_tpu.runtime import MeshRuntime

from fixtures import ffpp_config, tiny_detector


def _write_tree(root: str, fourcc: str, quality: int | None = None,
                fps=25.0, duration_s=4.0, size=64) -> str:
    """Separable FFPP tree (dark textures = real, bright = fake) with crops
    stored under the given codec. Content is deterministic per name, so two
    trees with different codecs hold the same source signal."""
    import cv2

    ids = ("000", "001", "002", "003")
    pairs = [f"{a}_{b}" for a, b in zip(ids[0::2], ids[1::2])]
    pairs += [f"{b}_{a}" for a, b in zip(ids[0::2], ids[1::2])]
    n = int(duration_s * fps)
    for t, names, lo in (("real", ids, 20), ("DF", pairs, 160)):
        for seed, name in enumerate(names):
            p = path.join(root, t, "raw", "videos", f"{name}.avi")
            os.makedirs(path.dirname(p), exist_ok=True)
            w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*fourcc), fps, (size, size))
            if quality is not None:
                w.set(cv2.VIDEOWRITER_PROP_QUALITY, quality)
            rng = np.random.default_rng(seed + (0 if t == "real" else 100))
            base = rng.integers(lo, lo + 70, (size, size, 3), np.uint8)
            for f in range(n):
                w.write(np.roll(base, f, axis=0))
            w.release()
    os.makedirs(path.join(root, "splits"), exist_ok=True)
    split = [[a, b] for a, b in zip(ids[0::2], ids[1::2])]
    for s in ("train", "val", "test"):
        with open(path.join(root, "splits", f"{s}.json"), "w") as f:
            json.dump(split, f)
    return root


def _auroc_on(root: str, runtime, det, trained) -> float:
    ds = FFPP(ffpp_config(root, random_speed=0, augmentation="none"),
              num_frames=4, clip_duration=2, runtime=runtime, split="test",
              index=0)
    cfg = Evaluator.get_default_config()
    cfg.batch_size = 4
    cfg.num_workers = 0
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    ev = Evaluator(cfg, runtime, [ds])
    ev.add_callback("on_evaluation_start", init_metrics)
    ev.add_callback("on_batch_end", update_metrics)
    ev.add_callback("on_evaluation_end", compute_metrics, training_eval_interval=1)
    ev.run(trained)
    return float(ev.computed_metrics["metric/deepfake/ffpp/roc_auc"])


def test_mp4v_storage_preserves_detection_signal(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")

    mp4v_root = _write_tree(str(tmp_path / "mp4v"), "mp4v")
    ffv1_root = _write_tree(str(tmp_path / "ffv1"), "FFV1")
    # c23-style recompression of the crop store: MPEG-4 again at reduced
    # quality (the codec family compression.py targets; x264 needs the
    # native encoder, exercised in test_preprocessing).
    c23_root = _write_tree(str(tmp_path / "c23"), "mp4v", quality=30)

    runtime = MeshRuntime()
    det = tiny_detector()
    train_ds = FFPP(ffpp_config(mp4v_root, random_speed=0), num_frames=4,
                    clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 30
    cfg.batch_size = 16 // runtime.data_parallel or 1
    cfg.num_workers = 0
    cfg.learning_rate = 3e-3
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    trainer = Trainer(cfg, runtime, det, [train_ds])
    trainer.run()

    auc_mp4v = _auroc_on(mp4v_root, runtime, det, trainer)
    auc_ffv1 = _auroc_on(ffv1_root, runtime, det, trainer)
    auc_c23 = _auroc_on(c23_root, runtime, det, trainer)

    # Trained on lossy-stored crops, the signal must hold on both stores and
    # survive recompression: mp4v storage may not cost detectability on
    # signal the model actually learned.
    assert auc_mp4v > 0.9, f"mp4v-store AUROC {auc_mp4v}"
    assert auc_ffv1 > 0.9, f"lossless-store AUROC {auc_ffv1} (codec shifted scores)"
    assert auc_c23 > 0.9, f"c23-recompressed AUROC {auc_c23}"
    assert abs(auc_mp4v - auc_ffv1) < 0.05, (auc_mp4v, auc_ffv1)
