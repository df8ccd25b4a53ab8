"""Preprocessing toolchain tests: alignment math, clip extraction, pipeline."""

import os
import subprocess
import sys
from os import path

import numpy as np
import pytest

REPO = path.dirname(path.dirname(path.abspath(__file__)))
sys.path.insert(0, path.join(REPO, "preprocessing"))

from face_align import affine_transform, crop_patch, cut_patch, load_mean_face  # noqa: E402


@pytest.fixture(scope="module")
def mean_face():
    return load_mean_face(path.join(REPO, "misc/20words_mean_face.npy"))


def test_mean_face_asset(mean_face):
    assert mean_face.shape == (68, 2)


def test_affine_recovers_known_transform(mean_face, rng):
    """Landmarks that are a rotated/scaled mean face warp back onto it."""
    import cv2

    theta, scale, tx, ty = 0.2, 1.3, 12.0, -7.0
    R = scale * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    landmarks = mean_face @ R.T + np.array([tx, ty])
    frame = rng.integers(0, 255, (400, 400, 3), dtype=np.uint8)
    warped, warped_lms = affine_transform(frame, landmarks, mean_face)
    assert warped.shape == (256, 256, 3)
    np.testing.assert_allclose(warped_lms, mean_face, atol=1e-6)


def test_cut_patch_dims_and_clamping(rng):
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    lms = np.full((10, 2), 128.0)
    patch = cut_patch(img, lms, 125, 125)
    assert patch.shape == (250, 250, 3)
    # centers beyond the border clamp (the reference's raise branches are
    # unreachable because clamping precedes the threshold check —
    # reproduced faithfully, extract_single_aligned_face.py:37-56)
    patch2 = cut_patch(img, np.full((10, 2), 10.0), 50, 50)
    assert patch2.shape == (100, 100, 3)
    patch3 = cut_patch(img, np.full((10, 2), -100.0), 50, 50)
    assert patch3.shape == (100, 100, 3)


def test_crop_patch_smoothing(mean_face, rng):
    frames = [rng.integers(0, 255, (300, 300, 3), dtype=np.uint8) for _ in range(5)]
    lms = np.stack([mean_face + 20 + rng.normal(0, 0.5, (68, 2)) for _ in range(5)])
    seq = crop_patch(frames, lms, mean_face, crop_height=150, crop_width=150)
    assert seq.shape == (5, 150, 150, 3)


def test_extract_single_aligned_face_cli(tmp_path, mean_face):
    """The CLI turns a video + landmarks into per-second clips + done marker."""
    import cv2

    from fixtures import write_video

    data_dir = tmp_path / "data"
    vid = data_dir / "videos" / "v.mp4"
    os.makedirs(vid.parent)
    write_video(str(vid), 50, fps=25.0, size=300, seed=1)
    lms_dir = data_dir / "landmarks"
    os.makedirs(lms_dir)
    lms = np.stack([mean_face + 25.0 for _ in range(50)])
    np.save(str(lms_dir / "v.npy"), lms)

    env = dict(os.environ, PYTHONPATH=path.join(REPO, "preprocessing"))
    subprocess.check_call(
        [sys.executable, path.join(REPO, "preprocessing/extract_single_aligned_face.py"),
         "--data_dir", str(data_dir) + "/", "--save_dir", str(tmp_path / "out") + "/",
         "--mean-face", path.join(REPO, "misc/20words_mean_face.npy"),
         "--crop-width", "150", "--crop-height", "150"],
        env=env, cwd=REPO,
    )
    outdir = tmp_path / "out" / "videos" / "v"
    assert (outdir / "done").is_file()
    clips = sorted(outdir.glob("*.avi"))
    assert len(clips) == 2  # 50 frames @ 25fps = 2 full seconds
    cap = cv2.VideoCapture(str(clips[0]))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 25
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 150
    cap.release()


def test_pipeline_end_to_end(tmp_path, monkeypatch):
    """extract_landmarks (haar fallback) -> crop -> get_result on a trained
    run dir produces a probability."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    sys.path.insert(0, REPO)
    import argparse

    import main as main_mod
    from fixtures import make_ffpp_tree, write_video
    from test_e2e import _write_e2e_config

    ffpp_root = make_ffpp_tree(str(tmp_path / "ffpp"))
    cfg_path = _write_e2e_config(tmp_path, ffpp_root)
    run_dir = main_mod.main(argparse.Namespace(cfg=cfg_path, debug=False, test=False))

    vid = tmp_path / "demo.mp4"
    write_video(str(vid), 60, fps=25.0, size=320, seed=9)

    import pipeline

    lms_path = pipeline.extract_landmarks(str(vid), backend="haar")
    assert np.load(lms_path).shape == (60, 68, 2)
    cropped = pipeline.get_cropped_video(str(vid), crop_size=150)
    assert path.isfile(cropped)
    p_fake = pipeline.get_result(str(vid), run_dir)
    assert 0.0 <= p_fake <= 1.0


def test_compression_cli_native(tmp_path, monkeypatch):
    """compression.py main() with the native libx264 encoder: c23 output
    exists, decodes to the same frame count, and is smaller than lossless."""
    import shutil

    import compression
    from fixtures import write_video

    pytest.importorskip("ctypes")
    from dfd_clip_tpu.data.native_video import NativeVideoLib

    try:
        lib = NativeVideoLib.get()
    except Exception as e:  # pragma: no cover - lib always builds in CI
        pytest.skip(f"native lib unavailable: {e}")

    src_dir = tmp_path / "raw" / "videos"
    src = src_dir / "a" / "0.avi"
    os.makedirs(src.parent)
    frames = (np.random.default_rng(0)
              .integers(0, 255, (25, 64, 64, 3), np.uint8))
    lib.encode_video(str(src), frames, fps=25, crf=0, codec="libx264")

    dst_dir = tmp_path / "c23"
    monkeypatch.setattr(shutil, "which", lambda _: None)  # force native path
    compression.main(compression.get_argparser().parse_args(
        ["--data_dir", str(tmp_path / "raw"), "--save_dir", str(dst_dir),
         "--crf", "23"]))

    dst = dst_dir / "videos" / "a" / "0.avi"
    assert dst.is_file()
    _, n, _ = lib.probe(str(dst))
    assert n == 25
    assert dst.stat().st_size < src.stat().st_size
    # idempotent: second run leaves mtime untouched
    mtime = dst.stat().st_mtime_ns
    compression.main(compression.get_argparser().parse_args(
        ["--data_dir", str(tmp_path / "raw"), "--save_dir", str(dst_dir),
         "--crf", "23"]))
    assert dst.stat().st_mtime_ns == mtime
