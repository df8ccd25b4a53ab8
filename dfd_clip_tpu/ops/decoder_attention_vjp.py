"""Trainable wrapper for the fused decoder-attention Pallas kernel.

Round-2 verdict item: training steps differentiate through the decoder (its
queries and temporal positional embedding are trainable), and the Pallas
kernel defines no VJP — so every train step ran the decoder forward on the
XLA composition (~3x the kernel's cost at flagship shapes,
/root/reference/src/models.py:99-146 semantics).

This module closes that gap with ``jax.custom_vjp``:

* **Forward**: the unmodified Pallas kernel in ``partials`` mode
  (ops/pallas_decoder_attention.py) — it already emits exactly the softmax
  state a backward pass needs (un-normalized per-head numerator, CoDA
  output, denominator, running max) because the sequence-parallel combine
  (ops/spmd.py) needed the same state. The final normalize runs as a tiny
  XLA epilogue, bit-matching the kernel's own in-kernel epilogue.
* **Backward**: hand-written XLA einsums over the saved stats for ALL
  differentiable leaves — q_smax, q_coda, temporal_pos, AND k/v. The k/v
  cotangents matter because adapter modes (models/adapter.py — CompInv and
  the nerf/adapter train modes, reference src/models.py:460-480) insert a
  trainable transform between the frozen encoder exports and the decoder:
  zeroing dK/dV would silently stop the adapter from learning. In the plain
  frozen-detector path K/V come through ``stop_gradient`` and the dK/dV
  einsums are dead code the jit DCEs. Affinities are reconstructed from
  (denominator, max) in f32 — one logits GEMM + one elementwise pass over
  K, the same reads the XLA backward pays anyway — instead of re-running
  the full XLA forward (rematerialization would eat the kernel's win) or
  saving the (B, L, H) affinity zoo from inside the kernel (extra
  VMEM->HBM stores on the hot path).

Gradient checks vs ``jax.grad`` of the XLA composition:
tests/test_pallas_ops.py::test_decoder_vjp_*. Opt-out: DFD_DEC_VJP=0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _sum_to(x: jax.Array, shape) -> jax.Array:
    """Reverse-broadcast reduce x to ``shape`` (for pos cotangents)."""
    while x.ndim > len(shape):
        x = x.sum(0)
    for i, (have, want) in enumerate(zip(x.shape, shape)):
        if want == 1 and have != 1:
            x = x.sum(i, keepdims=True)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_decoder_attention_trainable(q_smax, q_coda, k, v, mask,
                                      temporal_pos, layer):
    """((B,1,H,D), (B,1,H,D), K, V, (B,L), pos, layer) -> (B,1,H,D).

    K/V are (B, L, H, D), or the FULL stacked (Lsel, B, L, H, D) export
    buffers with ``layer`` set (slot read inside the kernel's BlockSpec —
    see fused_decoder_attention). Semantics == dual_activation_attention
    with attn_mode=() and a single query."""
    out, _ = _fwd(q_smax, q_coda, k, v, mask, temporal_pos, layer)
    return out


def _fwd(q_smax, q_coda, k, v, mask, temporal_pos, layer):
    from .pallas_decoder_attention import fused_decoder_attention

    b, _, h, d = q_smax.shape
    o_sc, st = fused_decoder_attention(
        q_smax, q_coda, k, v, mask, temporal_pos, layer=layer, partials=True
    )
    denom = st[:, 0]                                     # (B, H) f32
    mx = st[:, 1]                                        # (B, H) f32
    o_s = o_sc[:, 0].reshape(b, h, d) / jnp.maximum(denom, 1e-30)[..., None]
    o_c = o_sc[:, 1].reshape(b, h, d)
    cd = jnp.bfloat16 if k.dtype == jnp.int8 else k.dtype
    out = (0.5 * (o_s + o_c)).astype(cd)[:, None]        # (B, 1, H, D)
    # o_s joins the residuals: the Pallas backward's global softmax
    # coupling term S = Σ_l a_s·da collapses to 0.5·Σ_d g0·o_s, making the
    # backward single-pass over K/V (see fused_decoder_attention_bwd).
    return out, (q_smax, q_coda, k, v, mask, temporal_pos, denom, mx, o_s)


def _bwd_math(layer, q_smax, q_coda, k, v, mask, temporal_pos, denom, mx, ct):
    """Cotangents (dq_smax, dq_coda, dpos, dk, dv) from the saved softmax
    stats. dk/dv are for the SELECTED layer slot ((B, L, H, D) — the caller
    scatters into the stacked buffer when ``layer`` is set); they are zero
    at masked tokens, matching the XLA composition's where()-transposes.

    Plain jnp ops — on a multi-device mesh GSPMD partitions these einsums
    over the same (data, seq) sharding as the forward and inserts the
    L-reduction collectives itself (only the Pallas forward needs the
    shard_map wrapper)."""
    kl, vl = (k[layer], v[layer]) if layer is not None else (k, v)
    b, l = mask.shape
    _, _, h, d = q_smax.shape
    s = d ** -0.5
    f32 = jnp.float32

    qs = q_smax[:, 0].astype(f32)                        # (B, H, D)
    qc = q_coda[:, 0].astype(f32)
    kp = kl.astype(f32)                                  # (B, L, H, D)
    vp = vl.astype(f32)
    if temporal_pos is not None:
        pos = jnp.broadcast_to(temporal_pos, (l, h, d)).astype(f32)
        kp = kp + pos[None]
        vp = vp + pos[None]
    m = mask[:, :, None]                                 # (B, L, 1) -> (B,L,H)
    g0 = ct[:, 0].astype(f32)                            # (B, H, D)

    # ---- reconstruct the affinities from the saved stats (f32) ----
    ls = jnp.einsum("bhd,blhd->blh", qs * s, kp)
    p = jnp.where(m, jnp.exp(ls - mx[:, None, :]), 0.0)
    a_s = p / jnp.maximum(denom, 1e-30)[:, None, :]      # (B, L, H)
    lc = jnp.einsum("bhd,blhd->blh", qc * s, kp)
    t = jnp.tanh(lc)
    u = jnp.sum(jnp.abs(qc[:, None] - kp), axis=-1)      # (B, L, H)
    g_un = 2.0 * jax.nn.sigmoid(-u * s)
    gate = jnp.where(m, g_un, 0.0)

    # ---- cotangents; out = 0.5 * sum_l (a_s + tanh*gate) * vp ----
    w = jnp.einsum("bhd,blhd->blh", g0, vp)              # d(a_s + a_c)
    da = 0.5 * w
    dls = a_s * (da - jnp.sum(a_s * da, axis=1, keepdims=True))
    dt = da * gate
    dgate = da * t
    dlc = dt * (1.0 - t * t)
    # gate = mask * 2*sigmoid(-u*s); d(2σ(x))/dx = g_un*(1 - g_un/2)
    du = -s * jnp.where(m, dgate * g_un * (1.0 - 0.5 * g_un), 0.0)
    sign = jnp.sign(qc[:, None] - kp)                    # (B, L, H, D)

    dqs = s * jnp.einsum("blh,blhd->bhd", dls, kp)
    dqc = (s * jnp.einsum("blh,blhd->bhd", dlc, kp)
           + jnp.einsum("blh,blhd->bhd", du, sign))

    # kp = k + pos and vp = v + pos, so dk == dkp and dv == dvp (the pos
    # cotangent is their sum reverse-broadcast). Needed live whenever a
    # trainable adapter produced K/V; dead (jit-DCE'd) on the frozen path.
    dkp = (dls[..., None] * (qs[:, None] * s)
           + dlc[..., None] * (qc[:, None] * s)
           - du[..., None] * sign)                       # (B, L, H, D)
    dvp = 0.5 * (a_s + t * gate)[..., None] * g0[:, None]

    dpos = None
    if temporal_pos is not None:
        dpos = _sum_to(jnp.sum(dkp + dvp, axis=0), temporal_pos.shape)
        dpos = dpos.astype(temporal_pos.dtype)

    return (dqs[:, None].astype(q_smax.dtype),
            dqc[:, None].astype(q_coda.dtype), dpos,
            dkp.astype(kl.dtype), dvp.astype(vl.dtype))


def _scatter_slot(dk, dv, k, v, layer):
    """Place the selected-slot cotangents into full-shape buffers (stacked
    (Lsel, B, L, H, D) form when ``layer`` is set; identity otherwise).
    JAX sums these across the decoder's per-block calls, accumulating each
    block's slot into the shared export stack."""
    if layer is None:
        return dk, dv
    return (jnp.zeros_like(k).at[layer].set(dk),
            jnp.zeros_like(v).at[layer].set(dv))


def _bwd(layer, res, ct):
    import os

    q_smax, q_coda, k, v, mask, temporal_pos, denom, mx, o_s = res
    b, _, h, d = q_smax.shape
    # The Pallas backward consumes K/V in the export layout — the XLA
    # einsums' batched dots (h a non-leading batch dim) force a
    # tokens-minor relayout of the whole merged K/V stream instead
    # (~6.9 ms/step at flagship train shapes, round-5 PERF.md budget).
    # Geometry gate mirrors the forward kernel's batched-grid gate; small
    # test towers take the einsum path. dK/dV (live only under a trainable
    # adapter) always come from the einsums — jit-DCE'd when K/V are
    # stop_gradient'ed frozen exports.
    use_pallas = (
        (h * d) % 128 == 0
        and (2 * h) % 8 == 0
        and os.environ.get("DFD_DEC_BWD", "1") == "1"
        and os.environ.get("DFD_DEC_BATCHED", "1") == "1"
    )
    if use_pallas:
        from .pallas_decoder_attention import fused_decoder_attention_bwd

        dqs, dqc, dpos = fused_decoder_attention_bwd(
            q_smax, q_coda, k, v, mask, temporal_pos, layer, denom, mx,
            o_s, ct)
        dqs = dqs.astype(q_smax.dtype)
        dqc = dqc.astype(q_coda.dtype)
        if temporal_pos is not None:
            dpos = _sum_to(dpos, temporal_pos.shape).astype(temporal_pos.dtype)
        _, _, _, dk, dv = _bwd_math(layer, q_smax, q_coda, k, v, mask,
                                    temporal_pos, denom, mx, ct)
    else:
        dqs, dqc, dpos, dk, dv = _bwd_math(layer, q_smax, q_coda, k, v, mask,
                                           temporal_pos, denom, mx, ct)
    dk, dv = _scatter_slot(dk, dv, k, v, layer)
    return (
        dqs,
        dqc,
        dk,
        dv,
        np.zeros(mask.shape, dtype=jax.dtypes.float0),
        dpos,
    )


fused_decoder_attention_trainable.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def spmd_decoder_attention_trainable(q_smax, q_coda, k, v, mask,
                                     temporal_pos, layer, mesh):
    """Multi-chip trainable form: shard_map-Pallas forward over the
    (data, seq) mesh (ops/spmd.py partials combine), stats-based XLA
    backward that GSPMD partitions itself. Keeps the decoder kernel in
    multi-device TRAIN steps — previously only inference had the spmd
    path (round-2 verdict #2); training fell back to the XLA forward."""
    out, _ = _spmd_fwd(q_smax, q_coda, k, v, mask, temporal_pos, layer, mesh)
    return out


def _spmd_fwd(q_smax, q_coda, k, v, mask, temporal_pos, layer, mesh):
    from . import spmd

    out, denom, mx = spmd.spmd_decoder_attention(
        q_smax, q_coda, k, v, mask, temporal_pos, layer, mesh,
        return_stats=True)
    b, _, h, d = q_smax.shape
    out = out.reshape(b, 1, h, d)
    return out, (q_smax, q_coda, k, v, mask, temporal_pos, denom, mx)


def _spmd_bwd(layer, mesh, res, ct):
    q_smax, q_coda, k, v, mask, temporal_pos, denom, mx = res
    dqs, dqc, dpos, dk, dv = _bwd_math(layer, q_smax, q_coda, k, v, mask,
                                       temporal_pos, denom, mx, ct)
    dk, dv = _scatter_slot(dk, dv, k, v, layer)
    return (
        dqs,
        dqc,
        dk,
        dv,
        np.zeros(mask.shape, dtype=jax.dtypes.float0),
        dpos,
    )


spmd_decoder_attention_trainable.defvjp(_spmd_fwd, _spmd_bwd)
