"""Compression simulation (c23/c40) for raw clips.

Equivalent of /root/reference/preprocessing/compression.py: re-encode each
video at x264 CRF 23 (c23) / 40 (c40), idempotent per file. Encoder
preference: the ffmpeg binary when present, else the framework's native
libx264 path (csrc/videoencode.cpp — exact x264 CRF semantics, no binary
needed), else an OpenCV MJPEG approximation.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from glob import glob
from os import path, makedirs
from sys import stderr

CRF_TO_JPEG_QUALITY = {23: 80, 40: 35}


def compress_ffmpeg(src: str, dst: str, crf: int) -> None:
    subprocess.check_call(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", src,
         "-crf", str(crf), "-c:v", "libx264", dst]
    )


def compress_native(src_path: str, dst: str, crf: int) -> None:
    """libx264 CRF re-encode via the framework's native encoder."""
    import sys
    from os import path as _p

    sys.path.insert(0, _p.join(_p.dirname(_p.dirname(_p.abspath(__file__)))))
    from dfd_clip_tpu.data.native_video import NativeVideoLib

    lib = NativeVideoLib.get()
    fps, n_frames, _ = lib.probe(src_path)
    frames = lib.read_frames(src_path, [i / fps for i in range(n_frames)])
    lib.encode_video(dst, frames, fps=fps, crf=crf, codec="libx264")


def compress_opencv(src: str, dst: str, crf: int) -> None:
    import cv2

    cap = cv2.VideoCapture(src)
    fps = cap.get(cv2.CAP_PROP_FPS)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(
        dst, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h)
    )
    quality = CRF_TO_JPEG_QUALITY.get(crf, max(5, 100 - 2 * crf))
    writer.set(cv2.VIDEOWRITER_PROP_QUALITY, quality)
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        writer.write(frame)
    cap.release()
    writer.release()


def main(args):
    use_ffmpeg = shutil.which("ffmpeg") is not None
    use_native = False
    if not use_ffmpeg:
        try:
            import sys
            from os import path as _p

            sys.path.insert(0, _p.join(_p.dirname(_p.dirname(_p.abspath(__file__)))))
            from dfd_clip_tpu.data.native_video import NativeVideoLib

            NativeVideoLib.get()
            use_native = True
            print("ffmpeg binary not found; using native libx264 encoder", file=stderr)
        except (ImportError, OSError):  # missing .so OR loadable-but-broken
            print("no ffmpeg and no native lib; using OpenCV MJPEG approximation", file=stderr)
    src_videos = sorted(glob(path.join(args.data_dir, "**", f"*{args.vid_ext}"),
                             recursive=True))
    for i, src in enumerate(src_videos):
        rel = path.relpath(src, args.data_dir)
        dst = path.join(args.save_dir, rel)
        if path.isfile(dst):
            continue  # idempotent (reference checks fps; existence is enough)
        makedirs(path.dirname(dst), exist_ok=True)
        print(f"[{i + 1}/{len(src_videos)}] {rel}", file=stderr)
        try:
            if use_ffmpeg:
                compress_ffmpeg(src, dst, args.crf)
            elif use_native:
                compress_native(src, dst, args.crf)
            else:
                compress_opencv(src, dst, args.crf)
        except Exception as e:
            print(f"failed on {src}: {e}", file=stderr)
            if path.isfile(dst):
                os.remove(dst)


def get_argparser():
    parser = argparse.ArgumentParser(description="Compression simulation")
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--crf", default=23, type=int, help="23 = c23, 40 = c40")
    parser.add_argument("--vid_ext", default=".avi")
    return parser


if __name__ == "__main__":
    main(get_argparser().parse_args())
