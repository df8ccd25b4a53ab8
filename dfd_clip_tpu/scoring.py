"""Shared per-video scoring: sliding windows -> batched predict -> mean
softmax P(fake).

One implementation of the loop the reference spreads over pipeline.py:289-351
and inference.py:113-144, used by this repo's pipeline.py (single-video CLI)
and serve.py (HTTP scорer). Centralizing it fixed two divergent copies of the
same bugs:

* the seek-time filter ``t < frames/fps - 1e-6`` passed times in the last
  frame interval whose mapped index == frames (NTSC-style fps where
  container duration exceeds frames/fps), crashing read_frames on valid
  videos — the filter now asks the backend's own time->index mapping;
* short sub-batches were sent unpadded, giving jax.jit a fresh input shape
  per distinct clip count — a multi-minute XLA recompile per length in a
  long-lived server. Padding to ``batch_size`` is free (the mask already
  covers padded rows).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np


def resolve_deepfake_task(preset) -> int:
    """Deepfake head index: first-appearance order of data.train categories,
    matching training (main.category_index_map); single-task runs -> 0."""
    try:
        cats = list(dict.fromkeys(d.category for d in preset.data.train))
        return cats.index("Deepfake")
    except (AttributeError, KeyError, ValueError):
        return 0


def score_video(
    video_path: str,
    predict_fn: Callable,
    params,
    *,
    num_frames: int,
    clip_duration: float,
    batch_size: int = 16,
    depth: int = 3,
    lock: Optional[threading.Lock] = None,
) -> float:
    """All ``num_frames``-frame windows sampled every clip_duration/num_frames
    seconds -> mean softmax P(fake) over windows.

    ``predict_fn(params, x, m) -> (B, n_cls) logits`` for the Deepfake head
    (resolve_deepfake_task). ``lock`` serializes device use for multi-threaded
    callers (serve.py). Dispatch is pipelined with bounded ``depth``: each
    pending call pins its uint8 input batch on device, so unbounded dispatch
    grows device memory linearly with video length (inference.py pattern).
    """
    from .data.video import _time_to_frame_index, backend_for_path

    backend = backend_for_path(video_path)
    meta = backend.probe(video_path)
    stride = clip_duration / num_frames
    # keep only times whose mapped frame index exists (the backend's own
    # time->index rounding, NOT a duration comparison)
    times = [
        t for t in np.arange(0, meta.duration, stride)
        if _time_to_frame_index(t, meta.fps) < meta.frames
    ]
    frames = backend.read_frames(video_path, times)  # (N, H, W, 3)
    frames = np.ascontiguousarray(frames.transpose(0, 3, 1, 2))

    clips = [
        frames[i : i + num_frames]
        for i in range(0, len(frames) - num_frames + 1, num_frames)
    ]
    if not clips:
        raise ValueError(
            f"video too short: {len(frames)} frames < {num_frames}"
        )
    clips = np.stack(clips)
    masks = np.ones(clips.shape[:2], bool)

    if lock is None:
        lock = threading.Lock()
    N = batch_size
    with lock:
        pending, done = [], []
        for i in range(0, len(clips), N):
            x, m = clips[i : i + N], masks[i : i + N]
            valid = x.shape[0]
            if valid < N:
                # pad EVERY short sub-batch (not only tails of long videos):
                # constant shapes keep the jit cache at one entry
                x = np.concatenate([x, np.repeat(x[-1:], N - valid, 0)])
                m = np.concatenate([m, np.repeat(m[-1:], N - valid, 0)])
            pending.append((predict_fn(params, x, m), valid))
            if len(pending) >= depth:
                o, nv = pending.pop(0)
                done.append(np.asarray(o)[:nv])
        done.extend(np.asarray(o)[:nv] for o, nv in pending)
    logits = np.concatenate(done)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return float(p.mean(0)[1])
