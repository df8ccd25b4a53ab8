"""ctypes bindings for the first-party C++ video decoder (csrc/videodecode.cpp).

The shared library is built by ``python csrc/build.py`` (or make -C csrc) into
``csrc/libdfdvideo.so``. API:

  int dfd_probe(const char* path, double* fps, long* frames, double* duration);
  int dfd_read_frames(const char* path, const double* times, int n,
                      unsigned char* out, int* height, int* width);

``dfd_read_frames`` decodes the first frame with pts >= t for each requested
time (TorchVision seek semantics) into one contiguous RGB24 buffer.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libdfdvideo.so"),
    os.path.join(os.path.dirname(__file__), "libdfdvideo.so"),
]


class NativeVideoLib:
    _instance: Optional["NativeVideoLib"] = None

    def __init__(self, lib_path: str):
        self.lib = ctypes.CDLL(lib_path)
        self.lib.dfd_probe.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_double),
        ]
        self.lib.dfd_probe.restype = ctypes.c_int
        self.lib.dfd_frame_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        self.lib.dfd_frame_size.restype = ctypes.c_int
        self.lib.dfd_read_frames.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        self.lib.dfd_read_frames.restype = ctypes.c_int
        self.lib.dfd_read_frames_yuv.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int),
        ]
        self.lib.dfd_read_frames_yuv.restype = ctypes.c_int
        self.lib.dfd_encode_video.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        self.lib.dfd_encode_video.restype = ctypes.c_int

    @classmethod
    def get(cls) -> "NativeVideoLib":
        if cls._instance is None:
            for p in _LIB_PATHS:
                p = os.path.abspath(p)
                if os.path.isfile(p):
                    cls._instance = cls(p)
                    break
            else:
                raise ImportError(
                    "libdfdvideo.so not built; run `python csrc/build.py`"
                )
        return cls._instance

    def probe(self, path: str) -> Tuple[float, int, float]:
        fps = ctypes.c_double()
        frames = ctypes.c_long()
        duration = ctypes.c_double()
        rc = self.lib.dfd_probe(path.encode(), ctypes.byref(fps), ctypes.byref(frames),
                                ctypes.byref(duration))
        if rc != 0:
            raise IOError(f"native probe failed ({rc}): {path}")
        return fps.value, frames.value, duration.value

    def read_frames(self, path: str, times: List[float]) -> np.ndarray:
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self.lib.dfd_frame_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(f"native frame_size failed ({rc}): {path}")
        n = len(times)
        out = np.empty((n, h.value, w.value, 3), np.uint8)
        times_arr = (ctypes.c_double * n)(*times)
        rc = self.lib.dfd_read_frames(
            path.encode(), times_arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        if rc != 0:
            raise IOError(f"native read_frames failed ({rc}): {path}")
        return out

    def read_frames_yuv(self, path: str, times: List[float]):
        """Planar YUV420 fast path: returns (y (N,H,W), u, v (N,H/2,W/2),
        full_range). ~2x less CPU + PCIe than RGB; convert on device with
        ops.image_ops.yuv420_to_rgb."""
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = self.lib.dfd_frame_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(f"native frame_size failed ({rc}): {path}")
        n = len(times)
        y = np.empty((n, h.value, w.value), np.uint8)
        u = np.empty((n, h.value // 2, w.value // 2), np.uint8)
        v = np.empty((n, h.value // 2, w.value // 2), np.uint8)
        full_range = ctypes.c_int()
        times_arr = (ctypes.c_double * n)(*times)
        rc = self.lib.dfd_read_frames_yuv(
            path.encode(), times_arr, n,
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.byref(full_range),
        )
        if rc != 0:
            raise IOError(f"native read_frames_yuv failed ({rc}): {path}")
        return y, u, v, bool(full_range.value)

    def read_frames_yuv_into(self, path: str, times: List[float],
                             y: np.ndarray, u: np.ndarray, v: np.ndarray) -> bool:
        """Zero-copy variant: decode directly into caller-provided contiguous
        uint8 buffers (y: (N,H,W), u/v: (N,H/2,W/2)). Returns full_range."""
        n = len(times)
        assert y.flags["C_CONTIGUOUS"] and u.flags["C_CONTIGUOUS"] and v.flags["C_CONTIGUOUS"]
        full_range = ctypes.c_int()
        times_arr = (ctypes.c_double * n)(*times)
        rc = self.lib.dfd_read_frames_yuv(
            path.encode(), times_arr, n,
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.byref(full_range),
        )
        if rc != 0:
            raise IOError(f"native read_frames_yuv failed ({rc}): {path}")
        return bool(full_range.value)

    def encode_video(self, path: str, frames: np.ndarray, fps: float,
                     crf: int = 23, codec: str = "libx264") -> None:
        """Encode (N, H, W, 3) RGB uint8 frames; x264 CRF or mpeg4.

        The native replacement for the ffmpeg-CLI c23/c40 re-encode
        (reference preprocessing/compression.py:27)."""
        frames = np.ascontiguousarray(frames, np.uint8)
        n, h, w, _ = frames.shape
        rc = self.lib.dfd_encode_video(
            path.encode(),
            frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n, h, w, float(fps), int(crf), codec.encode(),
        )
        if rc != 0:
            raise IOError(f"native encode failed ({rc}): {path}")
