"""Single-video end-to-end demo pipeline.

Equivalent of /root/reference/pipeline.py: landmark extraction -> smoothed
affine face crop -> sliding num_frames windows -> Detector.predict -> mean
fake probability. The three stages are importable functions plus a __main__
driver:

  extract_landmarks(video)   -> <video>.npy (T, 68, 2)
  get_cropped_video(video)   -> cropped_<video>.avi (whole-video crop)
  get_result(video, run_dir) -> P(fake)

Landmark models resolve through preprocessing/get_landmark.py's backend
chain (facexlib -> face_alignment -> Haar-template fallback).
"""

from __future__ import annotations

import argparse
import sys
from os import path

import numpy as np

sys.path.insert(0, path.join(path.dirname(path.abspath(__file__)), "preprocessing"))


def extract_landmarks(video_path: str, backend: str = "auto") -> str:
    """Per-frame 68-pt landmarks -> sibling .npy (reference pipeline.py:87-95)."""
    from get_landmark import build_landmarker, process_video

    out = path.splitext(video_path)[0] + ".npy"
    process_video(video_path, out, build_landmarker(backend))
    return out


def get_cropped_video(video_path: str, crop_size: int = 250,
                      window_margin: int = 12) -> str:
    """Smoothed-landmark affine crop of the whole video
    (reference pipeline.py:230-243)."""
    import cv2

    from face_align import crop_patch, load_mean_face

    folder, name = path.split(video_path)
    stem, _ = path.splitext(name)
    out = path.join(folder, f"cropped_{stem}.avi")

    landmarks = np.load(path.splitext(video_path)[0] + ".npy")
    reference = load_mean_face(
        path.join(path.dirname(path.abspath(__file__)), "misc/20words_mean_face.npy")
    )

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()

    cropped = crop_patch(frames, landmarks, reference,
                         crop_height=crop_size, crop_width=crop_size,
                         window_margin=window_margin)
    writer = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             cropped[0].shape[:2][::-1])
    for f in cropped:
        writer.write(f)
    writer.release()
    return out


def get_result(video_path: str, weight_path: str, cfg_name: str = "setting") -> float:
    """Score the cropped video: sliding windows of num_frames frames sampled
    every clip_duration/num_frames seconds, batched predict, mean softmax
    (reference pipeline.py:289-351)."""
    import jax

    from dfd_clip_tpu import scoring
    from dfd_clip_tpu.config import CN
    from dfd_clip_tpu.models import Detector
    from inference import load_model_params
    from main import load_pretrained_encoder

    import yaml

    with open(path.join(weight_path, f"{cfg_name}.yaml")) as f:
        preset = CN(yaml.safe_load(f), new_allowed=True)
    model_cfg = Detector.get_default_config().merge_from_other_cfg(preset.model)
    num_frames = preset.data.num_frames

    folder, name = path.split(video_path)
    stem, ext = path.splitext(name)
    cropped_path = path.join(folder, f"cropped_{stem}.avi")

    model = Detector(model_cfg, num_frames)
    wrapper = CN(new_allowed=True)
    wrapper.model = model_cfg
    load_pretrained_encoder(model, wrapper)
    params = load_model_params(model, weight_path, "best")

    # Deepfake head (multi-task runs: rPPG may be task 0 — pipeline must
    # score the same head serve.py/inference.py resolve)
    task = scoring.resolve_deepfake_task(preset)
    predict = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][task])
    return scoring.score_video(
        cropped_path, predict, params,
        num_frames=num_frames, clip_duration=preset.data.clip_duration,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Single-video deepfake scoring")
    parser.add_argument("video", type=str)
    parser.add_argument("weights", type=str, help="training run dir (setting.yaml + best_weights.pt)")
    parser.add_argument("--cfg_name", default="setting")
    parser.add_argument("--landmark_backend", default="auto")
    args = parser.parse_args()

    extract_landmarks(args.video, args.landmark_backend)
    get_cropped_video(args.video)
    print("P(fake) =", get_result(args.video, args.weights, args.cfg_name))
