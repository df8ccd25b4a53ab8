"""Measure H2D bandwidth (bucketed by payload) and H2D<->compute overlap.

Round-4 verdict weak #6/#7: the e2e projection in bench.py composes two
measured terms with ONE assumed one — a production-host 8 GB/s PCIe H2D.
This tool measures what CAN be measured from this host:

  1. H2D bandwidth vs payload size on the live device path (here: the axon
     tunnel — the production PCIe number stays an assumption, but the
     SHAPE of the curve, i.e. the fixed per-transfer cost vs the streaming
     rate, transfers: we fit  t = a + bytes/BW  and report both terms).
  2. The overlap fraction the projection presumes: dispatch H2D of batch
     k+1 while batch k computes (depth-2 pipeline, the bench.py serving
     loop's scheme) and report
        overlap% = (t_h2d + t_comp - t_pipe) / min(t_h2d, t_comp)
     per window — 100% means the smaller term fully hides.

Usage: python tools/bench_h2d.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync_scalar(arr):
    """Force transfer completion (block_until_ready is a no-op on axon)."""
    np.asarray(arr.ravel()[0])


def measure_h2d(sizes_mb=(1, 4, 16, 64), reps=5):
    import jax

    rows = []
    for mb in sizes_mb:
        payload = np.random.default_rng(0).integers(
            0, 255, (mb * 1024 * 1024,), np.uint8)
        _sync_scalar(jax.device_put(payload))  # path warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync_scalar(jax.device_put(payload))
            times.append(time.perf_counter() - t0)
        t = sorted(times)[len(times) // 2]
        rows.append({"mb": mb, "s": round(t, 4),
                     "mb_per_s": round(mb / t, 1)})
        print(f"H2D {mb:4d} MB: {t * 1e3:8.1f} ms  {mb / t:8.1f} MB/s",
              flush=True)
    # least-squares fit t = a + bytes/bw over the buckets
    xs = np.array([r["mb"] for r in rows], float)
    ts = np.array([r["s"] for r in rows], float)
    A = np.vstack([np.ones_like(xs), xs]).T
    (a, inv_bw), *_ = np.linalg.lstsq(A, ts, rcond=None)
    fit = {"fixed_ms": round(a * 1e3, 2),
           "stream_mb_per_s": round(1.0 / inv_bw, 1) if inv_bw > 0 else None}
    print(f"fit: t = {fit['fixed_ms']} ms + bytes / "
          f"{fit['stream_mb_per_s']} MB/s", flush=True)
    return rows, fit


def measure_overlap(batch=16, frames=20, res=224, steps=6, reps=3):
    """Depth-2 pipeline: H2D(k+1) in flight while predict(k) computes."""
    import jax

    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES  # noqa: F401
    from dfd_clip_tpu.models.detector import Detector

    os.environ.setdefault("DFD_FUSED_BLOCK", "full")
    os.environ.setdefault("DFD_FRESH_ACC", "1")
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {"architecture": "ViT-B/16", "decode_mode": "index",
         "decode_indices": [6, 7, 8, 9, 10, 11], "out_dim": [2],
         "losses": ["auc_roc"],
         "op_mode": {"temporal_position": 1, "compute_int8": 1}})
    model = Detector(cfg, num_frames=frames)
    params = model.prepare_params(model.init_params(jax.random.key(0)))
    fn = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])

    rng = np.random.default_rng(0)
    hosts = [rng.integers(0, 255, (batch, frames, 3, res, res), np.uint8)
             for _ in range(2)]
    md = jax.device_put(np.ones((batch, frames), bool))

    xd = jax.device_put(hosts[0])
    np.asarray(fn(params, xd, md))  # compile + sync

    def t_h2d():
        t0 = time.perf_counter()
        for k in range(steps):
            _sync_scalar(jax.device_put(hosts[k % 2]))
        return time.perf_counter() - t0

    def t_comp():
        out = None
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(params, xd, md)
        np.asarray(out)
        return time.perf_counter() - t0

    def t_pipe():
        """H2D of k+1 dispatched before syncing predict of k."""
        cur = jax.device_put(hosts[0])
        out = None
        t0 = time.perf_counter()
        for k in range(steps):
            nxt = jax.device_put(hosts[(k + 1) % 2])  # in flight
            out = fn(params, cur, md)
            if out is not None and k:
                np.asarray(prev_out)  # sync the OLDER result
            prev_out, cur = out, nxt
        np.asarray(out)
        return time.perf_counter() - t0

    for f in (t_h2d, t_comp, t_pipe):
        f()  # warm
    rows = []
    for _ in range(reps):
        h, c, p = t_h2d(), t_comp(), t_pipe()
        ov = (h + c - p) / min(h, c)
        rows.append({"t_h2d_s": round(h, 3), "t_comp_s": round(c, 3),
                     "t_pipe_s": round(p, 3), "overlap": round(ov, 3)})
        print(f"h2d {h:.3f}s  comp {c:.3f}s  pipe {p:.3f}s  "
              f"overlap {100 * ov:5.1f}%", flush=True)
    return rows


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    print(f"backend={jax.default_backend()}", flush=True)
    h2d_rows, fit = measure_h2d()
    ov_rows = measure_overlap()
    out = {"backend": jax.default_backend(), "h2d": h2d_rows, "fit": fit,
           "overlap": ov_rows}
    path = sys.argv[1] if len(sys.argv) > 1 else "PERF_r5/h2d.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
