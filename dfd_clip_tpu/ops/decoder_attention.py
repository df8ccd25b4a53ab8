"""Dual-activation (softmax + CoDA) cross attention for the temporal decoder.

Behavioral spec from /root/reference/src/models.py:81-146: a learned query
attends the flattened (frames x patches) K/V token stream with the *mean* of
two activations —

  * masked softmax over the token axis (optionally factorized per-frame /
    per-temporal when ``attn_mode`` is set, src/models.py:105-115), and
  * CoDA (Compositional De-Attention, NeurIPS'19): ``tanh`` affinity gated by
    an L1-distance sigmoid, masked positions contributing exactly zero.

K and V come straight from the frozen encoder (head-split, never re-projected).
Logit math runs in fp32; the einsum contractions hit the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def dual_activation_attention(
    q_smax: jax.Array,
    q_coda: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    num_frames: int,
    attn_mode: Sequence[str] = (),
    temporal_pos: jax.Array | None = None,
    layer: int | None = None,
    differentiable: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Compute ((softmax + CoDA)/2) attention.

    Args:
      q_smax, q_coda: (B, Q, H, D) queries for each activation.
      k, v: (B, L, H, D) with L = num_frames * patches — or, with ``layer``,
        the FULL stacked (Lsel, B, L, H, D) export buffers; the selected
        slot is read without materializing a slice (custom-call operands
        cannot fuse with a producer slice — measured ~1.1 ms/block of copy
        at flagship shapes — so the Pallas path indexes inside its
        BlockSpec, and the XLA path slices where XLA fuses it for free).
      mask: (B, L) bool, True = attendable token.
      num_frames: static frame count (for factorized attn_mode reshapes).
      attn_mode: subset of {"frame", "temporal"}; empty = plain softmax.
      temporal_pos: optional (L, H, D) shared positional embedding added to
        BOTH K and V before attention (decoder semantics, src/models.py:326-
        330). Passing it here instead of pre-adding lets the Pallas path add
        it in-VMEM without materializing pos-added K/V copies.
      k_scale/v_scale: per-row dequant scales for int8_rows K/V ((B, L, 1)
        f32, or (Lsel, B, L, 1) stacked with ``layer``); dequant = q · s.
        The Pallas kernel dequantizes per tile in VMEM; the XLA path at the
        slot slice.

    Returns: (B, Q, H, D).
    """
    import os

    from . import attention as attention_ops

    # Multi-device: run the kernel per shard inside shard_map with an exact
    # cross-shard softmax combine (ops/spmd.py). Selected before the backend
    # resolution below because on a multi-device jit "auto" must otherwise
    # fall back to XLA (Pallas carries no GSPMD rules). Training takes the
    # custom-VJP form (same sharded forward; stats-based XLA backward that
    # GSPMD partitions itself) so multi-chip train steps keep the kernel too.
    if (
        not attn_mode
        and q_smax.shape[1] == 1
        and os.environ.get("DFD_ATTENTION_BACKEND", "auto") != "xla"
        # int8_rows trains on the XLA path (VJP not plumbed for scales);
        # inference shards the scales like K/V and dequantizes per tile
        and (k_scale is None or not differentiable)
        and not (differentiable
                 and os.environ.get("DFD_DEC_VJP", "1") == "0")
    ):
        from . import spmd

        mesh = spmd.spmd_pallas_mesh()
        if mesh is not None:
            b = q_smax.shape[0]
            l = k.shape[2] if layer is not None else k.shape[1]
            if spmd.decoder_shapes_ok(b, l, mesh):
                if differentiable:
                    from .decoder_attention_vjp import (
                        spmd_decoder_attention_trainable,
                    )

                    return spmd_decoder_attention_trainable(
                        q_smax, q_coda, k, v, mask, temporal_pos, layer, mesh
                    )
                return spmd.spmd_decoder_attention(
                    q_smax, q_coda, k, v, mask, temporal_pos, layer, mesh,
                    k_scale=k_scale, v_scale=v_scale,
                )

    # auto: the Pallas kernel on TPU (stacked-input form measured 10.7 vs
    # 11.3 ms XLA for the 6-block flagship decoder — and it sidesteps the
    # (B, 1, L, H) f32 intermediate zoo), XLA elsewhere and for the
    # factorized attn_mode / multi-query variants.
    backend = os.environ.get("DFD_ATTENTION_BACKEND", "auto")
    if backend == "auto":
        # per-device programs only — the shared GSPMD predicate
        backend = "pallas" if attention_ops.per_device_pallas() else "xla"
    # Training differentiates through the decoder (its queries and temporal
    # pos are trainable). The kernel itself defines no VJP, but
    # ops/decoder_attention_vjp.py wraps it in jax.custom_vjp: Pallas
    # forward (partials mode), hand-written backward over the saved softmax
    # stats. The round-4 chip A/B (pre-kv-pad) measured the custom VJP
    # LOSING (162.90 vs 165.21 clips/s/chip) and flipped the single-chip
    # default to the XLA forward; the round-5 re-run on the 8-aligned K/V
    # export flips it back — Pallas fwd wins both int8 (214.9 vs 208.8)
    # and bf16 (166.6 vs 164.2) because the XLA forward's batched dots
    # relayout the merged K/V stream (PERF.md round-5 train budget).
    # Opt-out: DFD_DEC_VJP=0. The encoder kernels never need a VJP — their
    # params are frozen and their exports stop_gradient'ed.
    if (
        differentiable
        and backend == "pallas"
        and not attn_mode
        and q_smax.shape[1] == 1
        and k_scale is None
        and os.environ.get("DFD_DEC_VJP", "1") == "1"
    ):
        from .decoder_attention_vjp import fused_decoder_attention_trainable

        return fused_decoder_attention_trainable(
            q_smax, q_coda, k, v, mask, temporal_pos, layer
        )
    if differentiable:
        backend = "xla"
    if backend == "pallas" and not attn_mode and q_smax.shape[1] == 1:
        from .pallas_decoder_attention import fused_decoder_attention

        return fused_decoder_attention(q_smax, q_coda, k, v, mask,
                                       temporal_pos, layer=layer,
                                       k_scale=k_scale, v_scale=v_scale)
    if layer is not None:
        k = k[layer]
        v = v[layer]
        if k_scale is not None:
            k_scale, v_scale = k_scale[layer], v_scale[layer]
    if k_scale is not None:
        # int8_rows dequant (XLA path): (B, L, 1) scale broadcast over (H, D)
        k = (k.astype(jnp.float32) * k_scale[..., None]).astype(q_smax.dtype)
        v = (v.astype(jnp.float32) * v_scale[..., None]).astype(q_smax.dtype)

    d = q_smax.shape[-1]
    scale = d ** -0.5
    f32 = jnp.float32
    m = mask[:, None, :, None]  # (B, 1, L, 1)

    # The shared temporal pos is added to K and V; done naively that
    # materializes two full (B, L, H, D) copies of the largest activation.
    # The contractions distribute instead — q·(k+pos) = q·k + q·pos and
    # aff@(v+pos) = aff@v + aff@pos — where the pos terms read the tiny
    # (L, H, D) embedding, not the batch-sized stream. Only the CoDA L1 gate
    # needs the literal k+pos values; that add fuses into its single
    # elementwise pass over K.
    pos = None
    if temporal_pos is not None:
        pos = jnp.broadcast_to(temporal_pos, k.shape[1:]).astype(f32)  # (L,H,D)

    # --- softmax branch ---
    logits = jnp.einsum(
        "bqhd,blhd->bqlh", q_smax * scale, k, preferred_element_type=f32
    )
    if pos is not None:
        logits = logits + jnp.einsum(
            "bqhd,lhd->bqlh", (q_smax * scale).astype(f32), pos
        )
    neg_inf = jnp.asarray(-jnp.inf, f32)
    logits = jnp.where(m, logits, neg_inf)
    if not attn_mode:
        aff_smax = jax.nn.softmax(logits, axis=2)
    else:
        b, q, l, h = logits.shape
        fact = logits.reshape(b, q, num_frames, l // num_frames, h)
        parts = []
        if "frame" in attn_mode:
            parts.append(jax.nn.softmax(fact, axis=3))
        if "temporal" in attn_mode:
            parts.append(jax.nn.softmax(fact, axis=2))
        if not parts:
            raise ValueError(f"attn_mode must contain 'frame' or 'temporal', got {attn_mode}")
        aff_smax = sum(parts).reshape(b, q, l, h)
    # Fully-masked rows produce NaNs from softmax(-inf); zero them out.
    aff_smax = jnp.where(jnp.isnan(aff_smax), jnp.zeros((), f32), aff_smax)

    # --- CoDA branch ---
    coda_logits = jnp.einsum(
        "bqhd,blhd->bqlh", q_coda * scale, k, preferred_element_type=f32
    )
    if pos is not None:
        coda_logits = coda_logits + jnp.einsum(
            "bqhd,lhd->bqlh", (q_coda * scale).astype(f32), pos
        )
    aff_coda = jnp.tanh(coda_logits)
    kp = k.astype(f32) if pos is None else k.astype(f32) + pos[None]
    l1 = jnp.sum(
        jnp.abs(q_coda[:, :, None].astype(f32) - kp[:, None, :]), axis=-1
    )  # (B, Q, L, H)
    gate = 2.0 * jax.nn.sigmoid(-l1 * scale)
    gate = jnp.where(m, gate, jnp.zeros((), f32))
    aff_coda = aff_coda * gate

    aff = (aff_smax + aff_coda) * 0.5
    out = jnp.einsum(
        "bqlh,blhd->bqhd", aff.astype(v.dtype), v, preferred_element_type=f32
    )
    if pos is not None:
        out = out + jnp.einsum("bqlh,lhd->bqhd", aff, pos)
    return out.astype(v.dtype)
