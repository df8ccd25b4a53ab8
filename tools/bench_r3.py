"""Round-3 same-process A/B ladder on the real chip.

Measures, in ONE process (only same-process numbers are comparable on the
ambient-drifting tunnel — PERF.md):

  1. flagship predict, bf16 default path (round-2 closed at 73.1 ms)
  2. flagship predict, int8 path (op_mode.compute_int8; round-2: 56.9 ms)
  3. jitted train step at the canonical batch-12 envelope
  4. optional experiments via env knobs (DFD_FUSED_FRAMES, DFD_MLP_FRAMES,
     DFD_DEC_TILE, DFD_FUSED_MLP, DFD_STACKED_EXPORT)

Usage: python tools/bench_r3.py [predict16 predict8 train]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
FRAMES = 20
RES = 224


def build(compute_int8: int):
    from dfd_clip_tpu.models.detector import Detector

    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "decode_mode": "index",
            "decode_indices": [6, 7, 8, 9, 10, 11],
            "out_dim": [2],
            "losses": ["auc_roc"],
            "op_mode": {"temporal_position": 1, "compute_int8": compute_int8},
        }
    )
    return Detector(cfg, num_frames=FRAMES)


def measure_predict(model, params, xd, md, tag, windows=3, depth=10):
    fn = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
    np.asarray(fn(params, xd, md))  # compile+sync
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = [fn(params, xd, md) for _ in range(depth)]
        for o in outs:
            np.asarray(o)
        times.append(time.perf_counter() - t0)
    t = sorted(times)[len(times) // 2] / depth
    print(f"{tag:34s} {t * 1e3:8.2f} ms/batch  {BATCH / t:7.1f} clips/s", flush=True)
    return t


def measure_train(batch=12, steps=8):
    import optax

    from dfd_clip_tpu.engine import optim as optim_lib

    model = build(0)
    params = model.init_params(jax.random.key(0))
    trainable, frozen = model.partition_params(params)
    optimizer = optim_lib.build_optimizer(
        model.optimizer_spec(), optim_lib.one_cycle_schedule(2.5e-3, 3000)
    )
    opt_state = optimizer.init(trainable)

    def train_step(trainable, opt_state, frozen, x, y, m, rng):
        def loss_fn(tr):
            task_losses, _, other = model.forward(
                {**frozen, **tr}, x, [y], m, train=True, single_task=0, rng=rng
            )
            return task_losses[0].mean() + sum(v.mean() for v in other.values())

        loss, grads = jax.value_and_grad(loss_fn)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    rng0 = np.random.default_rng(0)
    x = jax.device_put(rng0.integers(0, 255, (batch, FRAMES, 3, RES, RES), np.uint8))
    y = jax.device_put((np.arange(batch) % 2).astype(np.int32))
    m = jax.device_put(np.ones((batch, FRAMES), bool))
    rng = jax.random.key(1)

    trainable, opt_state, loss = step(trainable, opt_state, frozen, x, y, m, rng)
    float(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            trainable, opt_state, loss = step(trainable, opt_state, frozen, x, y, m, rng)
        float(loss)
        times.append((time.perf_counter() - t0) / steps)
    t = sorted(times)[1]
    print(f"{'train step (b=%d x %df)' % (batch, FRAMES):34s} {t * 1e3:8.2f} ms/step "
          f" {batch / t:7.1f} clips/s  {1 / t:5.2f} steps/s", flush=True)
    return t


def main():
    which = sys.argv[1:] or ["predict16", "predict8", "train"]
    print(f"backend={jax.default_backend()} batch={BATCH} "
          f"knobs: FUSED_FRAMES={os.environ.get('DFD_FUSED_FRAMES', '4')} "
          f"MLP_FRAMES={os.environ.get('DFD_MLP_FRAMES', '2')} "
          f"BLOCK={os.environ.get('DFD_FUSED_BLOCK', 'auto')} "
          f"BLOCK_FRAMES={os.environ.get('DFD_BLOCK_FRAMES', '2')} "
          f"DEC_TILE={os.environ.get('DFD_DEC_TILE', '512')} "
          f"FUSED_MLP={os.environ.get('DFD_FUSED_MLP', '1')} "
          f"STACKED={os.environ.get('DFD_STACKED_EXPORT', '1')}",
          flush=True)

    rng0 = np.random.default_rng(0)
    xd = jax.device_put(rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8))
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))

    if "predict16" in which:
        model = build(0)
        params = model.init_params(jax.random.key(0))
        measure_predict(model, params, xd, md, "predict bf16 (default)")
    if "predict8" in which:
        model8 = build(1)
        params8 = model8.init_params(jax.random.key(0))
        measure_predict(model8, params8, xd, md, "predict int8 (compute_int8)")
    if "train" in which:
        measure_train()


if __name__ == "__main__":
    main()
