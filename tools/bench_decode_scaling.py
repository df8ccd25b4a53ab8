"""Decode-path scaling measurement (round-1 verdict, next-round #9).

Measures the native decoder's clip-decode throughput at 1..N worker threads
and prints the host-core budget needed to keep one TPU chip fed. On the
1-core dev host threads cannot scale (the sweep SHOWS that honestly —
near-flat clips/s with rising aggregate CPU); the number that transfers to
production is the single-thread per-clip CPU cost: a host with C cores
decodes ~C x (1 / cost) clips/s, and `needed_cores` is the C at which decode
stops bounding the measured device throughput.

Usage: python tools/bench_decode_scaling.py [--threads 1,2,4] [--clips 24]
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_FRAMES = 20
RES = 224


def _make_videos(tmpdir: str, n: int):
    import cv2

    fps = float(NUM_FRAMES)
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32) / RES
    paths = []
    for i in range(n):
        p = os.path.join(tmpdir, f"v{i}.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), fps, (RES, RES))
        for f in range(int(fps * 3)):
            phase = f / fps
            r = np.sqrt((yy - 0.5 - 0.1 * np.sin(phase)) ** 2 + (xx - 0.5) ** 2)
            face = np.clip(200 - 300 * r + 20 * np.sin(8 * xx + phase), 0, 255)
            w.write(np.stack([face, face * 0.8 + 20, face * 0.7 + 10], -1).astype(np.uint8))
        w.release()
        paths.append(p)
    return paths, fps


def measure(paths, fps, n_threads: int, n_clips: int) -> dict:
    from dfd_clip_tpu.data.native_video import NativeVideoLib

    lib = NativeVideoLib.get()
    stride = ((fps - 1) / (NUM_FRAMES - 1)) / fps
    times = [i * stride for i in range(NUM_FRAMES)]
    y = [np.empty((NUM_FRAMES, RES, RES), np.uint8) for _ in range(n_threads)]
    u = [np.empty((NUM_FRAMES, RES // 2, RES // 2), np.uint8) for _ in range(n_threads)]
    v = [np.empty((NUM_FRAMES, RES // 2, RES // 2), np.uint8) for _ in range(n_threads)]

    work: "queue.Queue" = queue.Queue()
    for i in range(n_clips):
        work.put(paths[i % len(paths)])
    done = threading.Event()

    def worker(slot):
        while True:
            try:
                p = work.get_nowait()
            except queue.Empty:
                return
            lib.read_frames_yuv_into(p, times, y[slot], u[slot], v[slot])

    cpu0 = time.process_time()
    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(s,)) for s in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    cpu = time.process_time() - cpu0
    done.set()
    return {
        "threads": n_threads,
        "clips_per_sec": round(n_clips / wall, 2),
        "cpu_sec_per_clip": round(cpu / n_clips, 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="1,2,4")
    ap.add_argument("--clips", type=int, default=24)
    ap.add_argument("--device_clips_per_sec", type=float, default=200.0,
                    help="device throughput the decode plane must keep up with")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmpdir:
        paths, fps = _make_videos(tmpdir, 4)
        rows = [measure(paths, fps, int(t), args.clips)
                for t in args.threads.split(",")]

    per_clip_cpu = rows[0]["cpu_sec_per_clip"]
    needed = args.device_clips_per_sec * per_clip_cpu
    print(json.dumps({
        "sweep": rows,
        "single_thread_cpu_sec_per_clip": per_clip_cpu,
        "decode_clips_per_sec_per_core": round(1.0 / per_clip_cpu, 1),
        "cores_to_feed_device": round(needed, 1),
        "device_clips_per_sec_assumed": args.device_clips_per_sec,
        "note": "dev host has 1 core: the sweep shows thread overhead, not "
                "scaling; production scaling = cores x (1/cpu_sec_per_clip) "
                "because the decoder releases the GIL (csrc/videodecode.cpp)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
