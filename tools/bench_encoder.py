"""Encoder roofline micro-bench: per-component TFLOPS on the real TPU.

Times each GEMM shape of the ViT-B/16 encoder hot path, the LayerNorm, and
the full exported-K/V encoder, with the chained-in-jit methodology of
bench_attention.py (block_until_ready is a no-op on axon — PERF.md).
The output is the input to PERF.md's roofline account.

Usage: python tools/bench_encoder.py [component ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CLIPS, FRAMES, TOKENS, W = 16, 20, 197, 768
M = CLIPS * FRAMES * TOKENS  # 63040 token rows
ITERS = 20


def time_chained(fn, x0, *rest, iters=ITERS, name="", flops=0.0):
    @jax.jit
    def chained(x0, rest):
        def body(carry, _):
            out = fn(carry, *rest)
            nudge = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return carry + nudge.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, x0, (), length=iters)
        return jnp.sum(final.astype(jnp.float32))

    float(chained(x0, rest))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x0, rest))
        times.append((time.perf_counter() - t0) / iters)
    t = sorted(times)[1]
    eff = f"{flops / t / 1e12:7.1f} TFLOPS" if flops else ""
    print(f"{name:30s} {t * 1e3:8.3f} ms {eff}")
    return t


def main():
    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32), jnp.bfloat16)

    names = sys.argv[1:] or ["gemms", "ln", "encoder"]
    print(f"backend={jax.default_backend()}  M={M} rows")

    if "gemms" in names:
        x = bf(M, W)
        for label, (kin, kout) in {
            "qkv (768->2304)": (W, 3 * W),
            "out_proj (768->768)": (W, W),
            "c_fc (768->3072)": (W, 4 * W),
            "c_proj (3072->768)": (4 * W, W),
        }.items():
            w = bf(kin, kout)
            xin = x if kin == W else bf(M, kin)
            time_chained(lambda a, w: a @ w, xin, w,
                         name=f"gemm {label}", flops=2.0 * M * kin * kout)

    if "ln" in names:
        x = bf(M, W)
        from dfd_clip_tpu.models import layers

        p = layers.init_layer_norm(W)
        time_chained(lambda a, p: layers.layer_norm(p, a), x, p,
                     name="layer_norm (63040, 768)", flops=0)

    if "encoder" in names:
        from dfd_clip_tpu.models import clip_vit

        cfg = clip_vit.ARCHITECTURES["ViT-B/16"]
        params = clip_vit.init_clip_vision(jax.random.key(0), cfg)
        frames = bf(CLIPS * FRAMES, 3, 224, 224)
        keep = (6, 7, 8, 9, 10, 11)

        def enc(x, params):
            kvs = clip_vit.clip_vision_kv(params, x, cfg, jnp.bfloat16, keep_layers=keep)
            return kvs["k"][..., 0, 0, :] + kvs["v"][..., 0, 0, :]

        # FLOPs: 11 full blocks + qkv of block 11 (dead work skipped)
        per_tok_full = 2 * W * 3 * W + 2 * W * W + 2 * 2 * W * 4 * W
        gemm_flops = M * (11 * per_tok_full + 2 * W * 3 * W)
        attn_flops = 2 * CLIPS * FRAMES * 12 * 11 * (TOKENS * 64 * TOKENS * 2)
        time_chained(enc, frames, params, iters=5,
                     name="clip_vision_kv keep-6 (GEMM+attn)",
                     flops=float(gemm_flops + attn_flops))
        print(f"  gemm_flops={gemm_flops/1e12:.2f}T attn_flops={attn_flops/1e12:.3f}T")


if __name__ == "__main__":
    main()
