"""Probe the megakernel premise: grid (chunks, layers) with layers INNER
and the residual carried in the revisited output window vs one pallas call
per layer streaming h through HBM.

Premise being tested (PERF.md round 3): Mosaic's pipeline skips the DMA for
a block whose index is unchanged between consecutive grid steps, so with
grid=(C, L) and h blocks indexed (c, 0, 0):
  * the h input block is fetched once per chunk (not once per (chunk, layer)),
  * the output window is flushed once per chunk, and
  * the kernel can use the OUTPUT window as the carry across the inner layer
    sweep (read back what the previous layer step wrote).
If that holds, the per-layer h round-trip (~0.31 ms/layer at flagship bf16
shapes) collapses to one round-trip per chunk and the whole-encoder
megakernel is worth building. Model: one 768x768 GEMM per "layer" — small
enough that the h stream dominates a per-layer call, so the delta is legible.

Usage: python tools/bench_megakernel_probe.py [rows_per_chunk]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon plugin ignores the env var (CLAUDE.md); force it
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 63040          # 320 frames x 197 tokens (flagship)
W = 768
LAYERS = 12
DTYPE = jnp.bfloat16


def _interpret():
    return jax.default_backend() != "tpu"


def per_layer_calls(h, ws, rows_blk):
    """12 separate pallas calls; h streams HBM between layers (today's
    structure, reduced to one GEMM per layer)."""
    n = h.shape[0]

    def kern(h_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    for l in range(LAYERS):
        h = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, W), DTYPE),
            grid=(n // rows_blk,),
            in_specs=[
                pl.BlockSpec((rows_blk, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows_blk, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=_interpret(),
        )(h, ws[l])
    return h


def megakernel(h, ws, rows_blk):
    """ONE call, grid (chunks, layers) with layers inner; the output window
    carries h across the layer sweep."""
    n = h.shape[0]

    def kern(h_ref, w_ref, o_ref):
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            o_ref[...] = h_ref[...]

        o_ref[...] = jax.lax.dot_general(
            o_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, W), DTYPE),
        grid=(n // rows_blk, LAYERS),
        in_specs=[
            pl.BlockSpec((rows_blk, W), lambda c, l: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, W), lambda c, l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, W), lambda c, l: (c, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(h, jnp.stack(list(ws)))


def time_op(fn, *args, iters=20, name=""):
    @jax.jit
    def chained(h):
        def body(carry, _):
            out = fn(carry, *args)
            return out, ()

        final, _ = jax.lax.scan(body, h, (), length=iters)
        return jnp.sum(final.astype(jnp.float32))

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(ROWS, W)) * 0.02, DTYPE)
    float(chained(h0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(h0))
        times.append((time.perf_counter() - t0) / iters)
    t = sorted(times)[1]
    print(f"{name:36s} {t * 1e3:7.3f} ms", flush=True)
    return t


def main():
    check_only = "--check" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rows_blk = int(args[0]) if args else 7880  # 40 frames
    rng = np.random.default_rng(1)
    ws = [jnp.asarray(rng.normal(size=(W, W)) * 0.02, DTYPE) for _ in range(LAYERS)]
    print(f"rows={ROWS} W={W} layers={LAYERS} rows/chunk={rows_blk} "
          f"backend={jax.default_backend()}")
    # correctness first (small slice; interpret mode on CPU is slow, so
    # --check uses a small chunk: `--check 256`)
    rngc = np.random.default_rng(2)
    hc = jnp.asarray(rngc.normal(size=(rows_blk * 2, W)) * 0.02, DTYPE)
    a = np.asarray(per_layer_calls(hc, ws, rows_blk), np.float32)
    b = np.asarray(megakernel(hc, ws, rows_blk), np.float32)
    err = np.max(np.abs(a - b))
    assert err < 1e-2, f"megakernel wrong: max err {err}"
    print("correctness ok, max err", err)
    if check_only:
        return
    t_split = time_op(per_layer_calls, ws, rows_blk, name="12 per-layer calls (h via HBM)")
    t_mega = time_op(megakernel, ws, rows_blk, name="megakernel grid (chunks, layers)")
    print(f"delta {1e3 * (t_split - t_mega):+.3f} ms "
          f"(premise predicts ~-3 ms from the h stream collapse)")


if __name__ == "__main__":
    main()
