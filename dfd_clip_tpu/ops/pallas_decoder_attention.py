"""Pallas fused single-query dual-activation (softmax + CoDA) attention.

The decoder's hot op: one learned query attends L = frames x patches K/V
tokens per kept layer (src/models.py:99-146 semantics, see
ops/decoder_attention.py for the XLA spec). The fusion computes, per
(batch, head) grid step, entirely in VMEM:

    smax  = softmax(mask ? q_s.k/sqrt(d) : -inf)           over L
    coda  = tanh(q_c.k/sqrt(d)) * 2*sigmoid(-|q_c - k|_1/sqrt(d)) * mask
    out   = ((smax + coda)/2)^T v

avoiding two HBM-materialized (B, L, H) affinity tensors and the separate
L1-distance broadcast of the XLA path. Supports the default attention mode;
factorized attn_mode variants dispatch to the XLA implementation.

Honest v5e timing (see PERF.md methodology): XLA 3.3 ms vs this kernel
5.1 ms at B=16, L=3920 — XLA's fusion wins for the single-query,
bandwidth-light decoder, so XLA stays the default and this kernel is an
opt-in (DFD_ATTENTION_BACKEND=pallas) reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _decoder_attn_kernel(qs_ref, qc_ref, k_ref, v_ref, m_ref, o_ref):
    """One (b*h) slice; all intermediates kept 2-D ((L, 1) orientation) for
    Mosaic-friendly lowering. Blocks: qs/qc (1,1,D), k/v (1,L,D), m (1,L,1)."""
    qs = qs_ref[0].astype(jnp.float32)  # (1, D)
    qc = qc_ref[0].astype(jnp.float32)  # (1, D)
    k = k_ref[0].astype(jnp.float32)    # (L, D)
    v = v_ref[0].astype(jnp.float32)    # (L, D)
    mask = m_ref[0].astype(jnp.float32)  # (L, 1)
    d = k.shape[-1]
    scale = d ** -0.5

    # softmax branch: logits (L, 1)
    logits = jax.lax.dot_general(
        k, qs * scale, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    neg = jnp.float32(-1e30)
    logits = jnp.where(mask > 0, logits, neg)
    mx = jnp.max(logits, axis=0, keepdims=True)        # (1, 1)
    p = jnp.exp(logits - mx) * mask                    # (L, 1)
    denom = jnp.sum(p, axis=0, keepdims=True)          # (1, 1)
    smax = p / jnp.maximum(denom, 1e-30)

    # CoDA branch
    aff = jnp.tanh(
        jax.lax.dot_general(
            k, qc * scale, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )                                                  # (L, 1)
    l1 = jnp.sum(jnp.abs(k - qc), axis=1, keepdims=True)  # (L, 1)
    gate = 2.0 * jax.nn.sigmoid(-l1 * scale) * mask
    weights = (smax + aff * gate) * 0.5                # (L, 1)

    out = jax.lax.dot_general(
        weights, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, D)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_decoder_attention(
    q_smax: jax.Array,
    q_coda: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """(B,1,H,D), (B,1,H,D), (B,L,H,D), (B,L,H,D), (B,L) -> (B,1,H,D)."""
    b, q, h, d = q_smax.shape
    assert q == 1, "fused decoder attention is specialized for a single query"
    l = k.shape[1]

    def heads_first(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, -1, d)

    qs = heads_first(q_smax)
    qc = heads_first(q_coda)
    kf = heads_first(k)
    vf = heads_first(v)
    # mask as (B*H, L, 1), matching heads_first's (b, h) raveling; trailing
    # block dims equal the array dims (Mosaic tiling constraint).
    mf = (
        jnp.broadcast_to(mask[:, None, :], (b, h, l))
        .reshape(b * h, l, 1)
        .astype(jnp.float32)
    )

    out = pl.pallas_call(
        _decoder_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, 1, d), v.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qs, qc, kf, vf, mf)
    return out.reshape(b, h, 1, d).transpose(0, 2, 1, 3)
