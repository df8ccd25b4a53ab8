"""Shared face-alignment math for the offline preprocessing tools.

Behavior-equivalent reimplementation of the reference's alignment chain
(/root/reference/preprocessing/extract_single_aligned_face.py:16-84, also
duplicated in extract_faces.py:55-128 and pipeline.py:114-182 — unified here):

  window-smoothed 68-pt landmarks -> LMEDS partial-affine estimate against 8
  stable points of the 20words mean face -> 256^2 warp -> landmark-centered
  patch cut.

These are host/CPU ops (cv2): per-frame tiny linear algebra that XLA has no
business compiling; the device path starts at the decoded clip.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

STABLE_POINTS = (28, 33, 36, 39, 42, 45, 48, 54)
MEAN_FACE_PATH = "misc/20words_mean_face.npy"


def affine_transform(
    frame: np.ndarray,
    landmarks: np.ndarray,
    reference: np.ndarray,
    grayscale: bool = False,
    target_size: Tuple[int, int] = (256, 256),
    reference_size: Tuple[int, int] = (256, 256),
    stable_points: Sequence[int] = STABLE_POINTS,
    border_value: int = 0,
):
    """Warp ``frame`` so its stable landmarks match the mean face's."""
    import cv2

    if grayscale and frame.ndim == 3:
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    stable_reference = np.vstack([reference[p] for p in stable_points]).astype(np.float64)
    stable_reference[:, 0] -= (reference_size[0] - target_size[0]) / 2.0
    stable_reference[:, 1] -= (reference_size[1] - target_size[1]) / 2.0

    transform, _ = cv2.estimateAffinePartial2D(
        np.vstack([landmarks[p] for p in stable_points]),
        stable_reference,
        method=cv2.LMEDS,
    )
    warped = cv2.warpAffine(
        frame,
        transform,
        dsize=target_size,
        flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=border_value,
    )
    warped_landmarks = landmarks @ transform[:, :2].T + transform[:, 2]
    return warped, warped_landmarks


def cut_patch(img: np.ndarray, landmarks: np.ndarray, height: int, width: int,
              threshold: int = 5) -> np.ndarray:
    """Cut a (2*height, 2*width) patch centered on the landmark mean, clamped
    to the image with a small bias tolerance."""
    center_x, center_y = np.mean(landmarks, axis=0)

    if center_y - height < 0:
        center_y = height
    if center_y - height < 0 - threshold:
        raise ValueError("too much bias in height")
    if center_x - width < 0:
        center_x = width
    if center_x - width < 0 - threshold:
        raise ValueError("too much bias in width")
    if center_y + height > img.shape[0]:
        center_y = img.shape[0] - height
    if center_y + height > img.shape[0] + threshold:
        raise ValueError("too much bias in height")
    if center_x + width > img.shape[1]:
        center_x = img.shape[1] - width
    if center_x + width > img.shape[1] + threshold:
        raise ValueError("too much bias in width")

    return np.copy(
        img[
            int(round(center_y) - round(height)) : int(round(center_y) + round(height)),
            int(round(center_x) - round(width)) : int(round(center_x) + round(width)),
        ]
    )


def smooth_landmarks(landmarks: np.ndarray, frame_idx: int, window_margin: int) -> np.ndarray:
    """Temporal mean over a window, recentered on the current frame's mean."""
    margin = min(window_margin // 2, frame_idx, len(landmarks) - 1 - frame_idx)
    smoothed = np.mean(
        [landmarks[i] for i in range(frame_idx - margin, frame_idx + margin + 1)], axis=0
    )
    smoothed += landmarks[frame_idx].mean(axis=0) - smoothed.mean(axis=0)
    return smoothed


def crop_patch(
    frames: Sequence[np.ndarray],
    landmarks: np.ndarray,
    reference: np.ndarray,
    crop_height: int = 250,
    crop_width: int = 250,
    start_idx: int = 15,
    stop_idx: int = 68,
    window_margin: int = 12,
) -> np.ndarray:
    """The full per-video crop loop: smooth -> warp -> cut, per frame."""
    sequence = []
    length = min(len(landmarks), len(frames))
    for frame_idx in range(length):
        smoothed = smooth_landmarks(landmarks, frame_idx, window_margin)
        warped, warped_landmarks = affine_transform(frames[frame_idx], smoothed, reference)
        sequence.append(
            cut_patch(
                warped,
                warped_landmarks[start_idx:stop_idx],
                crop_height // 2,
                crop_width // 2,
            )
        )
    return np.array(sequence)


def load_mean_face(path: str = MEAN_FACE_PATH) -> np.ndarray:
    return np.load(path)
