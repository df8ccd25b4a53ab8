"""Capture a jax.profiler trace of the flagship train step on chip.

For the decoder-VJP decision (round-2 verdict #3 contingency): if the
XLA-routed decoder attention (ops/decoder_attention.py routes
differentiable traces to XLA — the Pallas kernel has no VJP) shows up as a
meaningful slice of the step, write the custom VJP; otherwise record the
profile evidence that it does not.

Usage: python tools/profile_train.py [outdir=/tmp/train_trace]
View:  the trace directory holds a .trace.json.gz per host — summarize with
       tools/trace_summary.py or load in Perfetto offline.
"""

from __future__ import annotations

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    import jax
    import jax.numpy as jnp
    import optax

    from dfd_clip_tpu.engine import optim as optim_lib
    from dfd_clip_tpu.models.detector import Detector

    batch = int(os.environ.get("BENCH_TRAIN_BATCH", "12"))
    frames = 20
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "decode_mode": "index",
            "decode_indices": [6, 7, 8, 9, 10, 11],
            "out_dim": [2],
            "losses": ["auc_roc"],
            "dropout": 0.5,
            # BENCH_TRAIN_INT8=1: profile the W8A8 frozen-forward train
            # composition (bench.py's int8 train rung) instead of bf16
            **({"op_mode": {"temporal_position": 1, "compute_int8": 1}}
               if os.environ.get("BENCH_TRAIN_INT8") == "1" else {}),
        }
    )
    model = Detector(cfg, num_frames=frames)
    params = model.init_params(jax.random.key(0))
    trainable, frozen = model.partition_params(params)
    frozen = model.prepare_params(frozen)  # int8: quantize the tower once
    optimizer = optim_lib.build_optimizer(
        model.optimizer_spec(), optim_lib.one_cycle_schedule(1e-3, 100))
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
    x = jax.device_put(rng0.integers(0, 255, (batch, frames, 3, 224, 224),
                                     np.uint8))
    y = jax.device_put((np.arange(batch) % 2).astype(np.int32))
    m = jax.device_put(np.ones((batch, frames), bool))
    rng = jax.random.key(1)

    trainable, opt_state, loss = step(trainable, opt_state, frozen, x, y, m, rng)
    float(loss)  # compile + sync
    print("compiled; tracing 5 steps ->", outdir, flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(5):
            trainable, opt_state, loss = step(
                trainable, opt_state, frozen, x, y, m, rng)
        float(loss)
    print("trace written", flush=True)


if __name__ == "__main__":
    main()
