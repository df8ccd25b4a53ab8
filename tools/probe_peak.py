"""Probe the chip's real MXU ceiling across shapes/dtypes.

Finds the attainable TFLOPS for the encoder's GEMM shapes and for ideal
shapes, to anchor the roofline in PERF.md. Chained-in-jit methodology
(block_until_ready is a no-op on axon — PERF.md).

Usage: python tools/probe_peak.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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
    print(f"{name:44s} {t * 1e3:8.3f} ms {eff}")
    return t


def main():
    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32), jnp.bfloat16)
    print(f"backend={jax.default_backend()}")

    M = 63040
    shapes = [
        ("encoder c_fc  (63040,768)@(768,3072)", M, 768, 3072),
        ("encoder qkv   (63040,768)@(768,2304)", M, 768, 2304),
        ("big K         (63040,3072)@(3072,3072)", M, 3072, 3072),
        ("square 4096", 4096, 4096, 4096),
        ("square 8192", 8192, 8192, 8192),
        ("tall 16384x4096x4096", 16384, 4096, 4096),
        ("wide N 63040x768x8192", M, 768, 8192),
    ]
    for name, m, k, n in shapes:
        x, w = bf(m, k), bf(k, n)
        time_chained(
            lambda a, w: jax.lax.dot_general(
                a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
            ),
            x, w, name=name + " ->bf16", flops=2.0 * m * k * n,
        )

    # f32 accumulate output for the c_fc shape (write traffic x2)
    x, w = bf(M, 768), bf(768, 3072)
    time_chained(
        lambda a, w: jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16),
        x, w, name="c_fc ->f32->bf16", flops=2.0 * M * 768 * 3072,
    )

    # back-to-back c_fc+gelu+c_proj (the MLP, fused by XLA)
    w1, w2 = bf(768, 3072), bf(3072, 768)
    def mlp(a, w1, w2):
        h = jax.lax.dot_general(a, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = (h * jax.nn.sigmoid(1.702 * h)).astype(jnp.bfloat16)
        return jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    time_chained(mlp, bf(M, 768), w1, w2, name="mlp c_fc+qgelu+c_proj",
                 flops=2.0 * M * 768 * 3072 * 2)


if __name__ == "__main__":
    main()
