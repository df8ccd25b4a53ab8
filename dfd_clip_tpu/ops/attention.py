"""Encoder self-attention op.

The frozen-encoder hot loop: full (bidirectional, unmasked) softmax attention
over 197 ViT tokens for every frame in the batch. Replaces the reference's
torch einsum path (/root/reference/src/clip/model.py:193-197) and xFormers'
``memory_efficient_attention`` (dinov2/layers/attention.py).

The default implementation is pure XLA — at 197-token sequence length the
whole attention fits VMEM tiles and XLA fuses it well. A Pallas fused kernel
can be slotted in behind the same signature (see ops/pallas_attention.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(N, T, H, D) x3 -> (N, T, H, D); softmax accumulated in fp32."""
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


def encoder_self_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatch to the configured attention backend.

    Default ("auto"): the Pallas fused kernel on TPU (measured ~2x faster
    than the XLA path for the 197-token encoder blocks, see PERF.md), XLA
    elsewhere. Override with DFD_ATTENTION_BACKEND=xla|pallas.
    """
    backend = os.environ.get("DFD_ATTENTION_BACKEND", "auto")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        return _xla_attention(q, k, v)
    if backend == "pallas":
        from .pallas_attention import fused_encoder_attention

        return fused_encoder_attention(q, k, v)
    raise ValueError(f"Unknown attention backend: {backend}")
