"""Capture a jax.profiler trace of the flagship int8 predict on chip.

Round-4 item 2 evidence: the session-10 chain decomposition leaves ~13.6 ms
of non-GEMM time per B=16x20f batch (quant VPU passes, LN, K/V export DMA,
decoder, dispatch) against a 38.2 ms pure int8-MXU budget. This trace names
the slices so the next lever is chosen from data, not guesses (the predict
analog of tools/profile_train.py; summarize with tools/trace_summary.py).

Runs bench.py's exact production composition (build_int8_model + its
prepare_params pre-quantized tower) at the winner knob defaults, with the
batch resident on device — the trace shows pure device time, no tunnel.

Usage: python tools/profile_predict.py [outdir=/tmp/predict_trace]
Env:   BENCH_BATCH (default 16), DFD_MEGAKERNEL etc. knobs respected.
"""

from __future__ import annotations

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/predict_trace"
    import jax
    import jax.numpy as jnp

    import bench

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    model = bench.build_int8_model()
    params = model.prepare_params(model.init_params(jax.random.key(0)))

    predict = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
    x = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (batch, bench.NUM_FRAMES, 3, bench.RES, bench.RES), np.uint8))
    m = jax.device_put(np.ones((batch, bench.NUM_FRAMES), bool))

    # dependency feed through the tiny mask so the 5 traced steps chain on
    # device without per-step host sync (bench.py measure_device_only)
    feed = jax.jit(lambda mm, out: jnp.logical_or(
        mm, (jnp.sum(out.astype(jnp.float32)) * 0).astype(bool)))

    out = predict(params, x, m)
    np.asarray(out)  # compile + sync (block_until_ready is a no-op on axon)
    print("compiled; tracing 5 chained predicts ->", outdir, flush=True)
    with jax.profiler.trace(outdir):
        mm = m
        for _ in range(5):
            out = predict(params, x, mm)
            mm = feed(mm, out)
        np.asarray(out)
    print("trace written", flush=True)


if __name__ == "__main__":
    main()
