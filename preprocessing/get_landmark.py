"""Per-video 68-pt landmark extraction -> landmarks/<video>.npy (T, 68, 2).

Equivalent of /root/reference/preprocessing/get_landmark.py: RetinaFace
detection (salient = first bbox, padded <= 15%) + FAN landmarks, written as
one .npy per video. The detector/landmarker backends are optional heavy
deps, resolved in order:

  1. ``facexlib`` (RetinaFace + AWing-FAN, the reference's stack)
  2. ``face_alignment`` (FAN; own detector)
  3. ``haar`` — OpenCV Haar-cascade detection with a canonical 68-point
     template scaled into the bbox. Geometry-only approximation that keeps
     the downstream crop pipeline runnable without model weights (demo/test
     use; real runs should install one of the above).

Output format is unchanged, so artifacts interoperate with the reference.
"""

from __future__ import annotations

import argparse
from glob import glob
from os import path, makedirs
from sys import stderr

import numpy as np

# A canonical 68-point layout in a unit box (x, y), hand-laid out to roughly
# match the iBUG-68 scheme: jaw (17), brows (10), nose (9), eyes (12),
# mouth (20). Used only by the 'haar' fallback.
def _template_68() -> np.ndarray:
    pts = []
    # jaw 0-16: half-ellipse
    for i in range(17):
        a = np.pi * (1.0 - i / 16.0)
        pts.append((0.5 + 0.48 * np.cos(a), 0.5 + 0.45 * np.sin(a) * 1.1))
    # right brow 17-21, left brow 22-26
    for i in range(5):
        pts.append((0.2 + 0.12 * i, 0.28))
    for i in range(5):
        pts.append((0.56 + 0.12 * i / 1.4, 0.28))
    # nose bridge 27-30, nostrils 31-35
    for i in range(4):
        pts.append((0.5, 0.33 + 0.07 * i))
    for i in range(5):
        pts.append((0.42 + 0.04 * i, 0.58))
    # right eye 36-41
    for i, (dx, dy) in enumerate([(-.06,0),(-.03,-.02),(.03,-.02),(.06,0),(.03,.02),(-.03,.02)]):
        pts.append((0.32 + dx, 0.38 + dy))
    # left eye 42-47
    for i, (dx, dy) in enumerate([(-.06,0),(-.03,-.02),(.03,-.02),(.06,0),(.03,.02),(-.03,.02)]):
        pts.append((0.68 + dx, 0.38 + dy))
    # mouth outer 48-59 + inner 60-67
    for i in range(12):
        a = 2 * np.pi * i / 12
        pts.append((0.5 + 0.14 * np.cos(a), 0.72 + 0.07 * np.sin(a)))
    for i in range(8):
        a = 2 * np.pi * i / 8
        pts.append((0.5 + 0.08 * np.cos(a), 0.72 + 0.035 * np.sin(a)))
    return np.asarray(pts, np.float64)


_TEMPLATE_68 = _template_68()


class TemplateFallback:
    """Geometry-only fallback: Haar cascade when this cv2 build ships
    objdetect, otherwise a centered bbox covering ~60% of the frame (valid
    for face-cropped inputs), with the 68-point template scaled in."""

    def __init__(self):
        import cv2

        self.cascade = None
        if hasattr(cv2, "CascadeClassifier") and hasattr(cv2, "data"):
            try:
                self.cascade = cv2.CascadeClassifier(
                    cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
                )
            except Exception:
                self.cascade = None
        self.last_box = None

    def _detect(self, frame_bgr: np.ndarray):
        import cv2

        h, w = frame_bgr.shape[:2]
        if self.cascade is not None:
            gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
            boxes = self.cascade.detectMultiScale(gray, 1.1, 4)
            if len(boxes):
                return tuple(boxes[0])
        if self.last_box is not None:
            return self.last_box
        side = int(0.6 * min(h, w))
        return ((w - side) // 2, (h - side) // 2, side, side)

    def __call__(self, frame_bgr: np.ndarray) -> np.ndarray:
        x, y, w, h = self._detect(frame_bgr)
        self.last_box = (x, y, w, h)
        # pad <= 15% like the reference bbox padding (get_landmark.py:92-101)
        pad = 0.15
        x0, y0 = x - pad * w / 2, y - pad * h / 2
        return _TEMPLATE_68 * np.array([w * (1 + pad), h * (1 + pad)]) + np.array([x0, y0])


def build_landmarker(backend: str):
    if backend in ("auto", "facexlib"):
        try:
            from facexlib.detection import init_detection_model  # type: ignore
            from facexlib.alignment import init_alignment_model, landmark_98_to_68  # type: ignore

            det = init_detection_model("retinaface_resnet50")
            align = init_alignment_model("awing_fan")

            def fn(frame_bgr):
                import torch

                with torch.no_grad():
                    bboxes = det.detect_faces(frame_bgr, 0.97)
                    if len(bboxes) == 0:
                        raise RuntimeError("no face")
                    box = bboxes[0][:4]
                    w, h = box[2] - box[0], box[3] - box[1]
                    pad = 0.15
                    crop = frame_bgr[
                        max(int(box[1] - pad * h / 2), 0) : int(box[3] + pad * h / 2),
                        max(int(box[0] - pad * w / 2), 0) : int(box[2] + pad * w / 2),
                    ]
                    lm98 = align.get_landmarks(crop)
                    lm68 = landmark_98_to_68(lm98)
                    lm68[:, 0] += max(int(box[0] - pad * w / 2), 0)
                    lm68[:, 1] += max(int(box[1] - pad * h / 2), 0)
                    return lm68

            return fn
        except ImportError:
            if backend == "facexlib":
                raise
    if backend in ("auto", "fan"):
        try:
            import face_alignment  # type: ignore

            fa = face_alignment.FaceAlignment(face_alignment.LandmarksType.TWO_D)

            def fn(frame_bgr):
                lms = fa.get_landmarks(frame_bgr[..., ::-1])
                if not lms:
                    raise RuntimeError("no face")
                return lms[0]

            return fn
        except ImportError:
            if backend == "fan":
                raise
    if backend in ("auto", "haar", "template"):
        print(
            "warning: no learned landmark model installed; using the "
            "bbox-template fallback (approximate, demo/test only)",
            file=stderr,
        )
        return TemplateFallback()
    raise ValueError(f"unknown landmark backend: {backend}")


def process_video(video_path: str, out_path: str, landmarker) -> None:
    import cv2

    cap = cv2.VideoCapture(video_path)
    lms = []
    last = None
    while cap.isOpened():
        ret, frame = cap.read()
        if not ret:
            break
        try:
            last = landmarker(frame)
        except Exception:
            if last is None:
                h, w = frame.shape[:2]
                last = _TEMPLATE_68 * np.array([w, h])
        lms.append(last)
    cap.release()
    makedirs(path.dirname(out_path), exist_ok=True)
    np.save(out_path, np.asarray(lms))


def main(args):
    landmarker = build_landmarker(args.backend)
    videos = sorted(glob(path.join(args.data_dir, "**", f"*{args.vid_ext}"),
                         recursive=True))
    if args.split_num > 1:
        # contiguous-block manual sharding, the alt extractor's convention
        # (reference preprocessing/landmarks.py:110-141 -s/-p): ceil-sized
        # block part_num of split_num
        size = -(-len(videos) // args.split_num)
        videos = videos[args.part_num * size : (args.part_num + 1) * size]
    videos = videos[args.shard_index :: args.num_shards]
    for i, vp in enumerate(videos):
        rel = path.relpath(vp, args.data_dir)
        out = path.join(args.save_dir, path.splitext(rel)[0] + ".npy")
        if path.isfile(out):
            continue
        print(f"[{i + 1}/{len(videos)}] {rel}", file=stderr)
        try:
            process_video(vp, out, landmarker)
        except Exception as e:
            print(f"failed on {vp}: {e}", file=stderr)


def get_argparser():
    parser = argparse.ArgumentParser(description="68-pt landmark extractor")
    parser.add_argument("--data_dir", required=True, type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--vid_ext", default=".mp4")
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "facexlib", "fan", "haar", "template"])
    parser.add_argument("--num_shards", default=1, type=int,
                        help="strided sharding: worker takes every Nth video")
    parser.add_argument("--shard_index", default=0, type=int)
    # the reference alt extractor's contiguous split/part convention
    # (preprocessing/landmarks.py -s/-p), for manual multi-worker launches
    parser.add_argument("-s", "--split_num", default=1, type=int,
                        help="contiguous sharding: split the list into S blocks")
    parser.add_argument("-p", "--part_num", default=0, type=int,
                        help="which contiguous block this worker processes")
    return parser


if __name__ == "__main__":
    main(get_argparser().parse_args())
