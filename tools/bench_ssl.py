"""SSL (DINO+iBOT) training-step throughput on the current backend.

The SSL meta-arch trains the ENCODER (student fwd+bwd + teacher fwd + EMA),
so unlike the detector train step no frozen-tower Pallas kernels apply —
this measures the pure XLA program the reference runs under torch FSDP
(dinov2/train/train.py hot loop). Reported as images/s/chip at the
canonical multi-crop recipe (2 globals @224 + n locals @98, block masks).

Usage: python -u tools/bench_ssl.py            # ViT-B/14, batch 8/chip
       BENCH_SSL_ARCH=ViT-S/14 BENCH_SSL_BATCH=16 python -u tools/bench_ssl.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class RandomImages:
    """Synthetic HWC uint8 dataset (augmentation statistics don't affect
    throughput; decode is excluded on purpose — this is the device step)."""

    def __init__(self, n: int = 64, hw: int = 256):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return r.integers(0, 255, (self.hw, self.hw, 3), np.uint8)


def main():
    import jax
    import jax.numpy as jnp

    from dfd_clip_tpu.runtime import MeshRuntime
    from dfd_clip_tpu.ssl.train import SSLTrainer

    cfg = SSLTrainer.get_default_config()
    cfg.arch = os.environ.get("BENCH_SSL_ARCH", "ViT-B/14")
    cfg.batch_size = int(os.environ.get("BENCH_SSL_BATCH", "8"))
    cfg.fsdp = int(os.environ.get("BENCH_SSL_FSDP", "0"))
    cfg.checkpoint_interval = 0
    runtime = MeshRuntime()
    tr = SSLTrainer(cfg, runtime, RandomImages())

    import itertools

    tr._sampler_iter = itertools.count()  # run() builds the real sampler
    g, l, masks = tr._next_batch(cfg.batch_size)
    gd = jax.device_put(jnp.asarray(g))
    ld = jax.device_put(jnp.asarray(l)) if l is not None else None
    md = jax.device_put(jnp.asarray(masks))
    rng = jax.random.key(1)

    student, teacher, centers, opt = (tr.student, tr.teacher, tr.centers,
                                      tr.opt_state)
    n_steps = int(os.environ.get("BENCH_SSL_STEPS", "8"))

    def window(n, student, teacher, centers, opt, base):
        metrics = None
        for i in range(n):
            student, teacher, centers, opt, metrics = tr._step_fn(
                student, teacher, centers, opt, gd, ld, md,
                jnp.asarray(base + i, jnp.int32), rng)
        float(metrics["total"])  # one sync drains the chained window
        return student, teacher, centers, opt

    # compile + first window (donated args: keep threading the live copies)
    state = window(1, student, teacher, centers, opt, 100)
    times = []
    for w in range(3):
        t0 = time.perf_counter()
        state = window(n_steps, *state, 100 + w * n_steps)
        times.append(time.perf_counter() - t0)
    elapsed = sorted(times)[1]
    n_chips = jax.device_count()
    per_chip = cfg.batch_size * runtime.data_parallel * n_steps / elapsed / n_chips
    print(f"ssl {cfg.arch} batch {cfg.batch_size}/chip x (2 global + "
          f"{cfg.n_local_crops} local crops): "
          f"{per_chip:7.2f} img/s/chip  {n_steps / elapsed:6.3f} steps/s",
          flush=True)


if __name__ == "__main__":
    main()
