"""Face crop & align -> exact 1-sec clips (the primary offline tool).

Equivalent of /root/reference/preprocessing/extract_single_aligned_face.py:
for each video under ``--data_dir`` with a matching ``landmarks/*.npy``,
window-smooth the landmarks, affine-align to the mean face, cut a centered
patch, and write one clip file per second plus a ``done`` marker.

Design change vs the reference: the default clip codec is MPEG-4 (``mp4v``)
rather than lossless FFV1 — FFV1 decodes ~60x slower and dominates the
training-time data plane; pass ``--codec ffv1`` for bit-identical storage
with the reference's artifacts. Output layout is unchanged:
``save_dir/<video>/<k>.avi`` for second k.
"""

from __future__ import annotations

import argparse
import math
import re
from glob import glob
from os import path, makedirs
from sys import stderr

import numpy as np

from face_align import crop_patch, load_mean_face

CODECS = {"mp4v": "mp4v", "ffv1": "FFV1", "mjpg": "MJPG", "x264": "x264"}


def process_video(video_path: str, data_dir: str, save_dir: str, reference: np.ndarray,
                  args) -> None:
    import cv2

    video_name = video_path[len(data_dir):]
    video_save_dir = path.join(save_dir, path.splitext(video_name)[0])
    if path.isfile(path.join(video_save_dir, "done")):
        print(f"skipping completed video: {video_name}", file=stderr)
        return

    cap = cv2.VideoCapture(video_path)
    fps = int(cap.get(cv2.CAP_PROP_FPS))
    if fps < 1:
        print(f"Invalid fps of {fps} in {video_name}", file=stderr)
        return
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

    cropped = crop_patch(
        frames, landmarks, reference,
        crop_height=args.crop_height, crop_width=args.crop_width,
        start_idx=args.start_idx, stop_idx=args.stop_idx,
        window_margin=args.window_margin,
    )

    fname_pad = math.floor(math.log(max(len(cropped) / fps, 1.0001), 10)) + 1
    native = None
    if args.codec == "x264":
        import sys
        from os import path as _p

        sys.path.insert(0, _p.join(_p.dirname(_p.dirname(_p.abspath(__file__)))))
        from dfd_clip_tpu.data.native_video import NativeVideoLib

        native = NativeVideoLib.get()
    else:
        fourcc = cv2.VideoWriter_fourcc(*CODECS[args.codec])
    for i in range(0, len(cropped), fps):
        clip = cropped[i : i + fps]
        if len(clip) < fps:
            break
        makedirs(video_save_dir, exist_ok=True)
        out_path = path.join(video_save_dir, f"{i // fps}".zfill(fname_pad))
        if native is not None:
            # frames are BGR (cv2); encoder wants RGB
            native.encode_video(f"{out_path}.avi", clip[..., ::-1], fps=fps,
                                crf=args.x264_crf, codec="libx264")
        else:
            writer = cv2.VideoWriter(f"{out_path}.avi", fourcc, fps, clip[0].shape[:2][::-1])
            for frame in clip:
                writer.write(frame)
            writer.release()

    if path.isdir(video_save_dir):
        with open(path.join(video_save_dir, "done"), "w"):
            pass


def main(args):
    reference = load_mean_face(args.mean_face)
    data_dir = path.join(path.expanduser(args.data_dir), "")
    save_dir = path.join(path.expanduser(args.save_dir), "")
    video_paths = sorted(glob(path.join(data_dir, f"**/*{args.vid_ext}"), recursive=True))
    # shard for multi-process runs (replaces Accelerate's loader sharding)
    video_paths = video_paths[args.shard_index :: args.num_shards]
    for i, vp in enumerate(video_paths):
        print(f"[{i + 1}/{len(video_paths)}] {vp}", file=stderr)
        try:
            process_video(vp, data_dir, save_dir, reference, args)
        except Exception as e:
            print(f"failed on {vp}: {e}", file=stderr)


def get_argparser():
    parser = argparse.ArgumentParser(description="Aligned face clip extractor")
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--mean-face", default="misc/20words_mean_face.npy")
    parser.add_argument("--vid_ext", default=".mp4")
    parser.add_argument("--crop-width", default=250, type=int)
    parser.add_argument("--crop-height", default=250, type=int)
    parser.add_argument("--start-idx", default=15, type=int)
    parser.add_argument("--stop-idx", default=68, type=int)
    parser.add_argument("--window-margin", default=12, type=int)
    parser.add_argument("--codec", default="mp4v", choices=sorted(CODECS))
    parser.add_argument("--x264-crf", dest="x264_crf", default=0, type=int,
                        help="CRF for --codec x264 (0 = lossless)")
    parser.add_argument("--num_shards", default=1, type=int)
    parser.add_argument("--shard_index", default=0, type=int)
    return parser


if __name__ == "__main__":
    main(get_argparser().parse_args())
