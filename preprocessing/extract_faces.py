"""Whole-video face crop variant.

Equivalent of /root/reference/preprocessing/extract_faces.py:198-238: same
smooth/affine/cut chain as extract_single_aligned_face but writes one cropped
video per input (plus the transformed landmarks .npy) — the format consumed
by the RPPG ``cropped_faces/`` folder and the semantic-parsing tool.
"""

from __future__ import annotations

import argparse
import re
from glob import glob
from os import path, makedirs
from sys import stderr

import numpy as np

from face_align import affine_transform, cut_patch, load_mean_face, smooth_landmarks
from extract_single_aligned_face import CODECS


def process_video(video_path: str, data_dir: str, save_dir: str, reference, args):
    import cv2

    video_name = video_path[len(data_dir):]
    out_video = path.join(save_dir, video_name)
    out_landmarks = path.splitext(out_video)[0] + "_landmarks.npy"
    if path.isfile(out_landmarks):
        print(f"skipping completed video: {video_name}", file=stderr)
        return

    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = []
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        frames.append(frame)
    cap.release()

    landmarks_path = re.sub("/videos/", "/landmarks/", video_path)
    landmarks_path = path.splitext(landmarks_path)[0] + ".npy"
    landmarks = np.load(landmarks_path)

    makedirs(path.dirname(out_video), exist_ok=True)
    writer = None
    out_lms = []
    length = min(len(landmarks), len(frames))
    for idx in range(length):
        smoothed = smooth_landmarks(landmarks, idx, args.window_margin)
        warped, warped_lms = affine_transform(frames[idx], smoothed, reference)
        patch = cut_patch(
            warped, warped_lms[args.start_idx : args.stop_idx],
            args.crop_height // 2, args.crop_width // 2,
        )
        if writer is None:
            writer = cv2.VideoWriter(
                out_video, cv2.VideoWriter_fourcc(*CODECS[args.codec]), fps,
                patch.shape[:2][::-1],
            )
        writer.write(patch)
        out_lms.append(warped_lms)
    if writer is not None:
        writer.release()
        np.save(out_landmarks, np.asarray(out_lms))


def main(args):
    reference = load_mean_face(args.mean_face)
    data_dir = path.join(path.expanduser(args.data_dir), "")
    save_dir = path.join(path.expanduser(args.save_dir), "")
    video_paths = sorted(glob(path.join(data_dir, f"**/*{args.vid_ext}"), recursive=True))
    video_paths = video_paths[args.shard_index :: args.num_shards]
    for i, vp in enumerate(video_paths):
        print(f"[{i + 1}/{len(video_paths)}] {vp}", file=stderr)
        try:
            process_video(vp, data_dir, save_dir, reference, args)
        except Exception as e:
            print(f"failed on {vp}: {e}", file=stderr)


def get_argparser():
    parser = argparse.ArgumentParser(description="Whole-video face cropper")
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--mean-face", default="misc/20words_mean_face.npy")
    parser.add_argument("--vid_ext", default=".avi")
    parser.add_argument("--crop-width", default=250, type=int)
    parser.add_argument("--crop-height", default=250, type=int)
    parser.add_argument("--start-idx", default=15, type=int)
    parser.add_argument("--stop-idx", default=68, type=int)
    parser.add_argument("--window-margin", default=12, type=int)
    parser.add_argument("--codec", default="mp4v", choices=sorted(CODECS))
    parser.add_argument("--num_shards", default=1, type=int)
    parser.add_argument("--shard_index", default=0, type=int)
    return parser


if __name__ == "__main__":
    main(get_argparser().parse_args())
