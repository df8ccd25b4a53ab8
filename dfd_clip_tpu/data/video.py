"""Video decode backends.

Replaces the TorchVision ``video_reader`` C++ backend the reference relies on
(/root/reference/src/datasets.py:30, 444-459, 636-662). Three backends behind
one interface:

  * ``native``  — first-party C++ seek-decoder (csrc/videodecode.cpp via
    ctypes; FFmpeg libavformat/libavcodec/libswscale). The production path.
  * ``opencv``  — cv2.VideoCapture frame-index seeking; correct for the
    constant-fps FFV1/x264 clips the preprocessing pipeline emits.
  * ``synthetic`` — deterministic generated frames for tests/benchmarks
    (``synthetic://<seed>?fps=25&duration=10&size=224``).

Seek semantics match TorchVision's ``seek(t); next()``: return the first
frame whose pts >= t. For constant-fps streams that is frame
``ceil(t * fps - eps)``.
"""

from __future__ import annotations

import dataclasses
import os
import urllib.parse
from typing import Dict, Sequence

import numpy as np


@dataclasses.dataclass
class VideoMeta:
    fps: float
    frames: int
    duration: float


def _time_to_frame_index(t: float, fps: float) -> int:
    return int(np.ceil(t * fps - 1e-6))


class SyntheticBackend:
    """Deterministic procedural clips; no file IO."""

    @staticmethod
    def _parse(path: str):
        parsed = urllib.parse.urlparse(path)
        q = urllib.parse.parse_qs(parsed.query)
        seed = int(parsed.netloc or 0)
        fps = float(q.get("fps", ["25"])[0])
        duration = float(q.get("duration", ["10"])[0])
        size = int(q.get("size", ["64"])[0])
        return seed, fps, duration, size

    def probe(self, path: str) -> VideoMeta:
        _, fps, duration, _ = self._parse(path)
        return VideoMeta(fps=fps, frames=round(duration * fps), duration=duration)

    def read_frames(self, path: str, times: Sequence[float]) -> np.ndarray:
        seed, fps, duration, size = self._parse(path)
        n_frames = round(duration * fps)
        out = []
        for t in times:
            idx = _time_to_frame_index(t, fps)
            if idx >= n_frames:
                raise IndexError(f"seek past end: t={t} of {duration}s")
            rng = np.random.default_rng((seed * 1_000_003 + idx) & 0x7FFFFFFF)
            frame = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            out.append(frame)
        return np.stack(out)


class OpenCVBackend:
    """cv2.VideoCapture with frame-index seeks (constant-fps streams)."""

    def probe(self, path: str) -> VideoMeta:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise IOError(f"cannot open video: {path}")
            fps = cap.get(cv2.CAP_PROP_FPS)
            frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            if fps <= 0:
                raise IOError(f"invalid fps for {path}")
            return VideoMeta(fps=fps, frames=frames, duration=frames / fps)
        finally:
            cap.release()

    def read_frames(self, path: str, times: Sequence[float]) -> np.ndarray:
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise IOError(f"cannot open video: {path}")
            fps = cap.get(cv2.CAP_PROP_FPS)
            n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            out = []
            last_idx = None
            for t in times:
                idx = _time_to_frame_index(t, fps)
                if idx >= n_frames:
                    raise IndexError(f"seek past end of {path}: t={t}")
                if last_idx is None or idx != last_idx + 1:
                    cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
                ok, frame = cap.read()
                if not ok:
                    raise IOError(f"decode failure at frame {idx} of {path}")
                last_idx = idx
                out.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            return np.stack(out)
        finally:
            cap.release()


class NativeBackend:
    """First-party C++ FFmpeg decoder (csrc/videodecode.cpp) via ctypes."""

    def __init__(self):
        from .native_video import NativeVideoLib

        self._lib = NativeVideoLib.get()

    def probe(self, path: str) -> VideoMeta:
        fps, frames, duration = self._lib.probe(path)
        return VideoMeta(fps=fps, frames=frames, duration=duration)

    def read_frames(self, path: str, times: Sequence[float]) -> np.ndarray:
        return self._lib.read_frames(path, list(times))


_BACKENDS: Dict[str, object] = {}


def get_backend(name: str | None = None):
    """Resolve a backend by name / DFD_VIDEO_BACKEND env (default: native,
    falling back to opencv when the native lib is unavailable)."""
    name = name or os.environ.get("DFD_VIDEO_BACKEND", "auto")
    if name in _BACKENDS:
        return _BACKENDS[name]
    if name == "synthetic":
        backend = SyntheticBackend()
    elif name == "opencv":
        backend = OpenCVBackend()
    elif name == "native":
        backend = NativeBackend()
    elif name == "auto":
        try:
            backend = NativeBackend()
        except Exception:
            backend = OpenCVBackend()
    else:
        raise ValueError(f"Unknown video backend: {name}")
    _BACKENDS[name] = backend
    return backend


def backend_for_path(path: str):
    """Synthetic URLs always use the synthetic backend."""
    if path.startswith("synthetic://"):
        return get_backend("synthetic")
    return get_backend()
