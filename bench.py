"""Throughput benchmark: 1-sec clips/sec/chip (decode -> CLIP -> head).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Pipeline measured: native C++ video decode (thread pool, overlapped) ->
uint8 host->device transfer -> device-side resize/normalize -> frozen
ViT-B/16 (bf16) with K/V export -> dual-attention decoder head. This is the
reference's inference hot path (/root/reference/inference.py:113-121 over
src/models.py:498-566).

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6), so
the baseline is an engineering estimate of the reference stack on one RTX
A5000: ViT-B/16 at 224^2 is ~17.5 GFLOPs/frame, 20-frame clips = ~0.35
TFLOPs/clip; the reference runs the encoder in fp32/TF32 (main.py:34
mixed_precision 'no', torch TF32 matmul), A5000 TF32 peak ~74 TFLOPS at ~40%
end-to-end utilization => ~30 TFLOPS => ~85 clips/s/chip. Recorded in
BASELINE_EST below with the derivation; the driver's BENCH_r{N}.json captures
the measured value.
"""

import json
import os
import queue
import sys
import threading
import time

import numpy as np

BASELINE_EST_CLIPS_PER_SEC = 85.0  # A5000 estimate, see module docstring

NUM_FRAMES = 20          # canonical config (configs/deepfake/deepfake.yaml)
CLIP_SECONDS = 1.0       # the metric is 1-sec clips
RES = 224
BATCH_CLIPS = int(os.environ.get("BENCH_BATCH", "16"))
WARMUP_STEPS = 3
BENCH_STEPS = int(os.environ.get("BENCH_STEPS", "15"))
DECODE_THREADS = int(os.environ.get("BENCH_DECODE_THREADS", str(os.cpu_count() or 8)))


def _build_model():
    import jax

    from dfd_clip_tpu.models.detector import Detector

    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "decode_mode": "index",
            "decode_indices": [6, 7, 8, 9, 10, 11],
            "out_dim": [2],
            "losses": ["auc_roc"],
        }
    )
    model = Detector(cfg, num_frames=NUM_FRAMES)
    params = model.init_params(jax.random.key(0))
    # encoder weights: use converted checkpoint when present (values don't
    # change throughput; random init otherwise)
    return model, params


def _make_bench_videos(tmpdir: str, n: int):
    """Write n MJPG videos (RES^2, >= CLIP_SECONDS+1) for the decode stage."""
    import cv2

    fps = float(NUM_FRAMES)  # 20 fps -> 20 frames per 1-sec clip
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        p = os.path.join(tmpdir, f"bench_{i}.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), fps, (RES, RES))
        base = rng.integers(0, 255, (RES, RES, 3), np.uint8)
        for f in range(int(fps * 3)):
            w.write(np.roll(base, f, axis=0))
        w.release()
        paths.append(p)
    return paths, fps


def _decode_worker(paths, fps, out_q: "queue.Queue", stop: threading.Event):
    """Decode 1-sec clips (NUM_FRAMES frames) round-robin over the files."""
    from dfd_clip_tpu.data.video import get_backend

    backend = get_backend()
    stride = ((int(fps * CLIP_SECONDS) - 1) / (NUM_FRAMES - 1)) / fps
    times = [i * stride for i in range(NUM_FRAMES)]
    i = 0
    while not stop.is_set():
        path = paths[i % len(paths)]
        i += 1
        frames = backend.read_frames(path, times)  # (T, H, W, 3)
        clip = np.ascontiguousarray(frames.transpose(0, 3, 1, 2))  # (T,3,H,W)
        try:
            out_q.put(clip, timeout=1.0)
        except queue.Full:
            pass


def main():
    import jax

    model, params = _build_model()
    predict = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])

    mask = np.ones((BATCH_CLIPS, NUM_FRAMES), bool)

    import tempfile

    with tempfile.TemporaryDirectory() as tmpdir:
        paths, fps = _make_bench_videos(tmpdir, max(4, DECODE_THREADS))
        clip_q: "queue.Queue" = queue.Queue(maxsize=4 * BATCH_CLIPS)
        stop = threading.Event()
        workers = [
            threading.Thread(target=_decode_worker, args=(paths, fps, clip_q, stop), daemon=True)
            for _ in range(DECODE_THREADS)
        ]
        for w in workers:
            w.start()

        def next_batch():
            clips = [clip_q.get() for _ in range(BATCH_CLIPS)]
            return np.stack(clips)

        # warmup (compile + queue fill)
        for _ in range(WARMUP_STEPS):
            out = predict(params, next_batch(), mask)
        jax.block_until_ready(out)

        t0 = time.perf_counter()
        for _ in range(BENCH_STEPS):
            out = predict(params, next_batch(), mask)
        jax.block_until_ready(out)
        elapsed = time.perf_counter() - t0
        stop.set()

    clips_per_sec = BATCH_CLIPS * BENCH_STEPS / elapsed
    n_chips = jax.device_count()
    per_chip = clips_per_sec / n_chips

    print(
        json.dumps(
            {
                "metric": "1-sec clips/sec/chip (decode->CLIP->head)",
                "value": round(per_chip, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(per_chip / BASELINE_EST_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
