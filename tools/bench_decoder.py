"""Decoder dual-activation attention: correctness + timing vs the XLA path.

Usage: python tools/bench_decoder.py [B L H D]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dfd_clip_tpu.ops.decoder_attention import dual_activation_attention
from dfd_clip_tpu.ops.pallas_decoder_attention import fused_decoder_attention


def time_chained(fn, args, iters=30, name=""):
    @jax.jit
    def chained(args):
        q, k, rest = args[0], args[1], args[2:]

        def body(carry, _):
            q, k = carry
            out = fn(q, k, *rest)
            s = jnp.sum(out.astype(jnp.float32))
            # nudge BOTH q and k: a loop-invariant k lets XLA hoist its f32
            # conversion/materialization out of the scan, understating the
            # real in-context cost
            return (q + 1e-6 * s.astype(q.dtype), k + 1e-9 * s.astype(k.dtype)), ()

        (q, k), _ = jax.lax.scan(body, (q, k), (), length=iters)
        return jnp.sum(q.astype(jnp.float32)) + jnp.sum(k[0].astype(jnp.float32))

    float(chained(args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(args))
        times.append((time.perf_counter() - t0) / iters)
    print(f"{name:28s} {sorted(times)[1] * 1e3:8.3f} ms")


def main():
    B, L, H, D = (int(a) for a in sys.argv[1:5]) if len(sys.argv) > 4 else (16, 3920, 12, 64)
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32), jnp.bfloat16)
    qs, qc = mk(B, 1, H, D), mk(B, 1, H, D)
    k, v = mk(B, L, H, D), mk(B, L, H, D)
    mask = np.ones((B, L), bool)
    mask[0, L // 2 :] = False  # ragged tail on one sample
    mask_j = jnp.asarray(mask)

    xla = jax.jit(lambda qs, qc: dual_activation_attention(qs, qc, k, v, mask_j, num_frames=20))
    pal = jax.jit(lambda qs, qc: fused_decoder_attention(qs, qc, k, v, mask_j))
    a = np.asarray(xla(qs, qc).astype(jnp.float32))
    b = np.asarray(pal(qs, qc).astype(jnp.float32))
    err = np.max(np.abs(a - b))
    print(f"B={B} L={L} H={H} D={D} backend={jax.default_backend()}  max|xla-pallas|={err:.5f}")
    assert err < 0.02, "fused decoder attention diverges from the XLA spec"

    time_chained(lambda qs, k, qc, v: dual_activation_attention(qs, qc, k, v, mask_j, num_frames=20),
                 (qs, k, qc, v), name="xla dual attention")
    time_chained(lambda qs, k, qc, v: fused_decoder_attention(qs, qc, k, v, mask_j),
                 (qs, k, qc, v), name="pallas fused (v2)")


if __name__ == "__main__":
    main()
