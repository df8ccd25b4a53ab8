"""Shared per-video scoring loop (dfd_clip_tpu/scoring.py) used by
pipeline.py and serve.py."""

import numpy as np
import pytest

from dfd_clip_tpu import scoring

from fixtures import write_video


def test_score_video_last_interval_seek_and_constant_shapes(tmp_path):
    """Two regressions in one pass over a real video:

    1. A sample time inside the last frame interval ((frames-1)/fps,
       frames/fps) maps to frame index == frames; the old duration-based
       filter (t < frames/fps - 1e-6) passed it and read_frames crashed on
       a perfectly scoreable video. fps=10, 40 frames, stride 0.395 puts
       t=3.95 exactly there.
    2. Short sub-batches must be PADDED to batch_size so a long-lived
       server's jit cache stays at one input shape per model.
    """
    pytest.importorskip("cv2")
    p = str(tmp_path / "v.avi")
    write_video(p, 40, fps=10.0, size=32, seed=0)

    shapes = []

    def predict(params, x, m):
        shapes.append(x.shape)
        return np.zeros((x.shape[0], 2), np.float32)

    score = scoring.score_video(
        p, predict, None, num_frames=4, clip_duration=1.58, batch_size=4
    )
    assert 0.0 <= score <= 1.0
    assert len(set(shapes)) == 1, f"jit would recompile per shape: {shapes}"


def test_resolve_deepfake_task():
    from dfd_clip_tpu.config import CN

    multi = CN({"data": {"train": [
        {"category": "rPPG"}, {"category": "Deepfake"}]}}, new_allowed=True)
    assert scoring.resolve_deepfake_task(multi) == 1
    single = CN({"data": {"train": [{"category": "Deepfake"}]}}, new_allowed=True)
    assert scoring.resolve_deepfake_task(single) == 0
    assert scoring.resolve_deepfake_task(CN(new_allowed=True)) == 0
