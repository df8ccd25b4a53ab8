"""Pallas fused attention kernels.

The TPU-native replacements for the xFormers CUDA kernels of the reference
(SURVEY.md §2.9 #5). Two kernels:

  * ``fused_encoder_attention`` — full softmax self-attention for the frozen
    ViT (197 tokens/frame, unmasked): one (batch, head) grid step computes
    logits -> softmax -> weighted sum entirely in VMEM, never materializing
    the (T, T) probabilities in HBM.
  * ``fused_decoder_attention`` (ops/pallas_decoder_attention.py) — the
    single-query dual-activation decoder attention.

On CPU (tests) the kernels run in interpreter mode automatically. The
dispatcher in ops/attention.py selects backend by the
``DFD_ATTENTION_BACKEND`` env var; XLA remains the default — measured on
v5e the XLA path already sustains ~90% MXU utilization for the encoder
(bench history in BENCH notes), so the Pallas path is provided for parity,
experimentation, and as the substrate for future fusions (K/V export +
layer-select in one pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _encoder_attn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch*head) slice: q,k,v (1, T, D) blocks -> out (1, T, D)."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    d = q.shape[-1]
    logits = jax.lax.dot_general(
        q * (d ** -0.5), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, T)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def fused_encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(N, T, H, D) x3 -> (N, T, H, D), fused per (n, h) in VMEM."""
    n, t, h, d = q.shape

    def reshape_in(x):
        return x.transpose(0, 2, 1, 3).reshape(n * h, t, d)

    qf, kf, vf = reshape_in(q), reshape_in(k), reshape_in(v)

    out = pl.pallas_call(
        _encoder_attn_kernel,
        out_shape=jax.ShapeDtypeStruct((n * h, t, d), q.dtype),
        grid=(n * h,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out.reshape(n, h, t, d).transpose(0, 2, 1, 3)
