"""Face semantic parsing -> per-pixel class-label videos.

Equivalent of /root/reference/preprocessing/segmentation.py: FaRL face parser
(``facer`` package, 'farl/lapa/448') driven by 5 points derived from the 68
landmarks, per-pixel labels written as videos (+ optional visualization).
Feeds the ``patch_mask.type=guide`` probability map.

The facer/FaRL stack is an optional heavy dep (not baked in); the tool exits
with a clear message without it.
"""

from __future__ import annotations

import argparse
import re
from glob import glob
from os import path, makedirs
from sys import stderr

import numpy as np


def five_points(landmarks68: np.ndarray) -> np.ndarray:
    le = landmarks68[36:42].mean(axis=0)
    re_ = landmarks68[42:48].mean(axis=0)
    nose = landmarks68[30]
    ml = landmarks68[48]
    mr = landmarks68[54]
    return np.stack([le, re_, nose, ml, mr])


def main(args):
    try:
        import facer  # type: ignore
        import torch
    except ImportError as e:
        raise SystemExit(
            f"segmentation requires the 'facer' (FaRL) package ({e}); "
            "install it to run this offline tool"
        )
    import cv2

    device = "cuda" if torch.cuda.is_available() else "cpu"
    parser_model = facer.face_parser("farl/lapa/448", device=device)

    videos = sorted(glob(path.join(args.data_dir, "**", f"*{args.vid_ext}"),
                         recursive=True))
    for i, vp in enumerate(videos):
        rel = path.relpath(vp, args.data_dir)
        out = path.join(args.save_dir, rel)
        if path.isfile(out):
            continue
        print(f"[{i + 1}/{len(videos)}] {rel}", file=stderr)
        try:
            _segment_one(vp, out, parser_model, device)
        except Exception as e:  # per-item isolation, like every other tool
            # here (extract_faces.py:78-81 etc.) and the reference
            # (segmentation.py:111-136): one missing landmarks file or
            # unreadable video must not abort the batch sweep
            print(f"Error on {rel}: {e}", file=stderr)


def _segment_one(vp, out, parser_model, device):
    import cv2
    import numpy as np
    import torch

    lms_path = path.splitext(vp)[0] + "_landmarks.npy"
    if not path.isfile(lms_path):
        lms_path = re.sub("/videos/", "/landmarks/", path.splitext(vp)[0]) + ".npy"
    landmarks = np.load(lms_path)

    cap = cv2.VideoCapture(vp)
    fps = cap.get(cv2.CAP_PROP_FPS)
    writer = None
    fidx = 0
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        pts = five_points(landmarks[min(fidx, len(landmarks) - 1)])
        image = torch.from_numpy(frame[..., ::-1].copy()).permute(2, 0, 1)[None].to(device)
        faces = {
            "rects": torch.tensor(
                [[pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]],
                device=device,
            ),
            "points": torch.from_numpy(pts[None]).float().to(device),
            "image_ids": torch.tensor([0], device=device),
        }
        with torch.inference_mode():
            parsed = parser_model(image, faces)
        labels = parsed["seg"]["logits"].argmax(dim=1)[0].cpu().numpy().astype(np.uint8)
        if writer is None:
            makedirs(path.dirname(out), exist_ok=True)
            writer = cv2.VideoWriter(
                out, cv2.VideoWriter_fourcc(*"FFV1"), fps, labels.shape[::-1], False
            )
        writer.write(labels)
        fidx += 1
    cap.release()
    if writer is not None:
        writer.release()


def get_argparser():
    parser = argparse.ArgumentParser(description="FaRL face semantic parsing")
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--vid_ext", default=".avi")
    return parser


if __name__ == "__main__":
    main(get_argparser().parse_args())
