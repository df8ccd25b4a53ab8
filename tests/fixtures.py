"""On-disk dataset fixtures: tiny FFPP/CDF-layout trees with real videos."""

from __future__ import annotations

import json
import os
from os import path

import numpy as np


def write_video(fpath: str, n_frames: int, fps: float = 25.0, size: int = 64,
                seed: int = 0) -> None:
    import cv2

    os.makedirs(path.dirname(fpath), exist_ok=True)
    w = cv2.VideoWriter(fpath, cv2.VideoWriter_fourcc(*"MJPG"), fps, (size, size))
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, (size, size, 3), np.uint8)
    for i in range(n_frames):
        frame = np.clip(base.astype(np.int32) + (i % 50), 0, 255).astype(np.uint8)
        w.write(frame)
    w.release()


def make_ffpp_tree(root: str, ids=("000", "001", "002", "003"),
                   types=("REAL", "DF"), compressions=("raw", "c23"),
                   duration_s: float = 4.0, fps: float = 25.0, size: int = 64) -> str:
    """FFPP-layout tree with paired real/fake videos + splits json."""
    type_dirs = {"REAL": "real", "DF": "DF", "F2F": "F2F", "FS": "FS", "NT": "NT"}
    n = int(duration_s * fps)
    seed = 0
    pairs_both = [
        f"{a}_{b}"
        for a, b in zip(ids[0::2], ids[1::2])
    ] + [f"{b}_{a}" for a, b in zip(ids[0::2], ids[1::2])]
    for t in types:
        names = list(ids) if t == "REAL" else pairs_both
        for comp in compressions:
            for name in names:
                write_video(
                    path.join(root, type_dirs[t], comp, "videos", f"{name}.avi"),
                    n, fps, size, seed=seed,
                )
                seed += 1
    pairs = [[a, b] for a, b in zip(ids[0::2], ids[1::2])]
    os.makedirs(path.join(root, "splits"), exist_ok=True)
    for split in ("train", "val", "test"):
        with open(path.join(root, "splits", f"{split}.json"), "w") as f:
            json.dump(pairs, f)
    return root


def make_cdf_tree(root: str, n_videos: int = 3, duration_s: float = 4.0,
                  fps: float = 25.0, size: int = 64) -> str:
    os.makedirs(path.join(root, "csv_files"), exist_ok=True)
    rows = {"real": [], "fake": []}
    seed = 100
    for label in ("REAL", "FAKE"):
        for i in range(n_videos):
            name = f"{label.lower()}{i}"
            write_video(
                path.join(root, label, "videos", f"{name}.avi"),
                int(duration_s * fps), fps, size, seed=seed,
            )
            rows[label.lower()].append(f"{name}.avi {0 if label == 'REAL' else 1}")
            seed += 1
    for label in ("real", "fake"):
        with open(path.join(root, "csv_files", f"test_{label}.csv"), "w") as f:
            f.write("\n".join(rows[label]))
    return root


def ffpp_config(root: str, **overrides):
    from dfd_clip_tpu.data.datasets import FFPP

    cfg = FFPP.get_default_config()
    cfg.root_dir = root
    cfg.types = ["REAL", "DF"]
    cfg.category = "deepfake"
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def tiny_detector(num_frames: int = 4, **model_overrides):
    """A Detector shrunk to a 3-layer width-64 tower for fast tests."""
    import dataclasses

    import jax.numpy as jnp

    from dfd_clip_tpu.models import clip_vit
    from dfd_clip_tpu.models.detector import Detector

    tiny = clip_vit.ViTConfig(
        input_resolution=32, patch_size=16, width=64, layers=3, heads=4, output_dim=32
    )
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "decode_mode": "index",
            "decode_indices": [0, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
            **model_overrides,
        }
    )
    det = Detector(cfg, num_frames=num_frames, compute_dtype=jnp.float32)
    det.vit_cfg = tiny
    det.transform = dataclasses.replace(det.transform, size=tiny.input_resolution)
    det.decoder_cfg = dataclasses.replace(det.decoder_cfg, width=tiny.width, heads=tiny.heads)
    if det.adapter_cfg is not None:
        det.adapter_cfg = dataclasses.replace(
            det.adapter_cfg, width=tiny.width, patches=tiny.num_patches, inner_dim=32
        )
    return det
