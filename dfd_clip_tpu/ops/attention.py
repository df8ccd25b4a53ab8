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

import contextlib
import contextvars
import os

import jax
import jax.numpy as jnp

# Marks traces that run INSIDE a shard_map body: there the program is
# per-device by construction, so Pallas custom calls (which carry no GSPMD
# partition rules) are safe regardless of the global device count. Set by
# ops/spmd.py's wrappers; a contextvar so it scopes correctly across nested
# traces and threads.
_LOCAL_PROGRAM = contextvars.ContextVar("dfd_local_program", default=False)


@contextlib.contextmanager
def local_program():
    """Mark the enclosed trace as a per-device (shard_map-local) program."""
    token = _LOCAL_PROGRAM.set(True)
    try:
        yield
    finally:
        _LOCAL_PROGRAM.reset(token)


def in_local_program() -> bool:
    return _LOCAL_PROGRAM.get()


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(N, T, H, D) x3 -> (N, T, H, D); softmax accumulated in fp32."""
    d = q.shape[-1]
    scale = d ** -0.5
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


def per_device_pallas() -> bool:
    """Whether backend=auto should take the Pallas kernels for the current
    trace. Pallas custom calls carry no GSPMD partition rules: under a
    multi-chip jit the partitioner would replicate their operands
    (all-gathering the batch-sharded activation stream). So auto picks the
    kernels only where the program is per-device by construction: a single
    device, or inside a shard_map body (ops/spmd.py wraps the encoder tower
    and the decoder attention in shard_map over the runtime mesh, so
    multi-chip keeps the fused kernels). DFD_SPMD_PALLAS=1 extends the
    shard_map case to non-TPU backends (CPU interp-mode testing of the spmd
    path). The ONE definition of this predicate — attention, decoder
    attention, and the decoder boundary stack must never drift apart.
    Force DFD_ATTENTION_BACKEND=pallas to override under your own shard_map.
    """
    if in_local_program() and os.environ.get("DFD_SPMD_PALLAS") == "1":
        return True
    single = jax.device_count() == 1 or in_local_program()
    return jax.default_backend() == "tpu" and single


def _backend() -> str:
    backend = os.environ.get("DFD_ATTENTION_BACKEND", "auto")
    if backend == "auto":
        backend = "pallas" if per_device_pallas() else "xla"
    return backend


def use_fused_blocks() -> bool:
    """True when the encoder should run the fused Pallas attention-block
    kernel (LN1+qkv+attention+out-proj in one custom call); the XLA
    composition remains the fallback and the parity oracle."""
    return _backend() == "pallas"


def encoder_self_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatch to the configured attention backend.

    Default ("auto"): the Pallas fused kernel on TPU (measured ~2x faster
    than the XLA path for the 197-token encoder blocks, see PERF.md), XLA
    elsewhere. Override with DFD_ATTENTION_BACKEND=xla|pallas.
    """
    backend = _backend()
    if backend == "xla":
        return _xla_attention(q, k, v)
    if backend == "pallas":
        from .pallas_attention import fused_encoder_attention

        return fused_encoder_attention(q, k, v)
    raise ValueError(f"Unknown attention backend: {backend}")


def encoder_self_attention_qkv(qkv: jax.Array, heads: int, head_dim: int) -> jax.Array:
    """Self-attention over the PACKED qkv projection.

    qkv: (N, T, 3·width) — the in-projection output laid out [q | k | v],
    each a width-wide block of ``heads`` × ``head_dim`` columns. Returns the
    head-merged attention output (N, T, width), ready for the out-projection.

    Why packed: Pallas kernels are XLA custom-calls, and custom-call inputs
    cannot fuse with their producers — splitting q/k/v first would
    materialize three full (N, T, width) copies per encoder layer just to
    feed the kernel (measured ~4 ms/batch at flagship shapes, PERF.md). The
    packed form consumes the qkv GEMM's output buffer directly.
    """
    n, t, w3 = qkv.shape
    w = heads * head_dim
    assert w3 == 3 * w, (qkv.shape, heads, head_dim)
    backend = _backend()
    if backend == "pallas":
        from .pallas_attention import fused_encoder_attention_qkv

        return fused_encoder_attention_qkv(qkv, heads, head_dim)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _xla_attention(
        q.reshape(n, t, heads, head_dim),
        k.reshape(n, t, heads, head_dim),
        v.reshape(n, t, heads, head_dim),
    )
    return out.reshape(n, t, w)
