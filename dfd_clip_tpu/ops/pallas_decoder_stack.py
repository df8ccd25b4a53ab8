"""Pallas decoder-block boundary kernel: the XLA interstitial, fused away.

The decoder's per-block math around the fused attention kernel
(models/decoder.py:194-215, re-architecting /root/reference/src/models.py:
272-361) is a chain of small ops on (B, width) vectors: out-projection +
residual + LN2 + MLP + residual, then the NEXT block's LN1 + query
in-projection. Each is microseconds of compute, but as ~12 separate XLA ops
per block (plus the fusion boundaries around the attention custom call) the
chain measured ~3.6 ms across the 6-block flagship decoder — pure dispatch
overhead, not math.

``decoder_boundary`` runs one block boundary in ONE Pallas call:

    [attn_out -> out_proj -> +x -> LN2 -> c_fc -> QuickGELU -> c_proj -> +x]
    [-> LN1' -> in_proj' -> qrow']          (next block's query half)

with static flags for the stack edges (first boundary = query-only, last =
tail-only). Back-to-back Pallas calls have no inter-call overhead (PERF.md),
so the decoder becomes 6 attention + 7 boundary kernels with zero XLA ops
between. All GEMMs are M=B rows — tiny; the win is consolidation, not FLOPs.
Numerics mirror models/layers.py exactly: LayerNorm in f32 cast back to the
activation dtype, GEMMs bf16 with f32 accumulate then cast, biases added in
the activation dtype, QuickGELU in the activation dtype.

Used by decoder.apply_decoder on the single-device TPU inference path
(training differentiates the XLA composition; the spmd/multi-chip path keeps
the XLA interstitial for now). DFD_DEC_STACK=0 opts out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .pallas_attention import (  # noqa: E402  (shared VMEM/interpret knobs)
    _compiler_params,
    _interpret,
)


def _boundary_kernel(*refs, has_tail: bool, has_query: bool, width: int,
                     hidden: int):
    """Single grid step over the full (B, ·) operands.

    Operand order (present only when the corresponding flag is set):
      tail:  o (B, W), x (B, W), wo (W, W), bo (1, W), ln2s/ln2b (1, W),
             wfc (W, hidden), bfc (1, hidden), wproj (hidden, W), bproj (1, W)
      query: ln1s/ln1b (1, W), win (W, 2W), bin (1, 2W)
    Outputs: x_out (B, W) [tail], qrow (B, 2W) [query].
    """
    it = iter(refs)
    if has_tail:
        o_ref, x_ref, wo_ref, bo_ref, ln2s_ref, ln2b_ref = (
            next(it), next(it), next(it), next(it), next(it), next(it))
        wfc_ref, bfc_ref, wproj_ref, bproj_ref = (
            next(it), next(it), next(it), next(it))
    else:
        x_ref = next(it)
    if has_query:
        ln1s_ref, ln1b_ref, win_ref, bin_ref = (
            next(it), next(it), next(it), next(it))
    outs = list(it)
    x_out_ref = outs.pop(0) if has_tail else None
    qrow_ref = outs.pop(0) if has_query else None

    def ln(x32, s_ref, b_ref):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * s_ref[...] + b_ref[...]

    def linear_bf16(y, w_ref, b_ref):
        """layers.linear semantics on a bf16 activation row-block."""
        acc = jax.lax.dot_general(
            y, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(y.dtype)
        return acc + b_ref[...].astype(y.dtype)

    x = x_ref[...]  # (B, W) activation dtype
    if has_tail:
        out = linear_bf16(o_ref[...], wo_ref, bo_ref)
        x = x + out
        y2 = ln(x.astype(jnp.float32), ln2s_ref, ln2b_ref).astype(x.dtype)
        mid = linear_bf16(y2, wfc_ref, bfc_ref)
        # QuickGELU in f32 (Mosaic's logistic lowering broadcasts an f32
        # constant internally and rejects bf16 vectors — same reason the
        # encoder kernels run their GELU in f32); cast back for the GEMM.
        m32 = mid.astype(jnp.float32)
        mid = (m32 * jax.nn.sigmoid(1.702 * m32)).astype(mid.dtype)
        x = x + linear_bf16(mid, wproj_ref, bproj_ref)
        x_out_ref[...] = x
    if has_query:
        y1 = ln(x.astype(jnp.float32), ln1s_ref, ln1b_ref).astype(x.dtype)
        qrow_ref[...] = linear_bf16(y1, win_ref, bin_ref)


def decoder_boundary(
    x: jax.Array,
    attn_out: jax.Array | None,
    tail_params: dict | None,
    query_params: dict | None,
):
    """One decoder block boundary in one Pallas call.

    x: (B, W) activation-dtype residual stream. attn_out: (B, W) attention
    output feeding the tail, or None at the first boundary. tail_params:
    {"attn_out_proj": {"w","b"}, "ln_2": {...}, "mlp": {"c_fc","c_proj"}} of
    the block being closed; query_params: {"ln_1": {...}, "in_proj":
    {"w","b"}} of the block being opened. Returns (x_out, qrow) with the
    absent halves None.
    """
    has_tail = tail_params is not None
    has_query = query_params is not None
    assert has_tail or has_query
    b, w = x.shape
    dt = x.dtype
    f32 = jnp.float32

    full = lambda shape: pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    inputs, in_specs = [], []
    hidden = w * 4
    if has_tail:
        mlp = tail_params["mlp"]
        hidden = mlp["c_fc"]["w"].shape[1]
        op = tail_params["attn_out_proj"]
        inputs += [
            attn_out.astype(dt),
            x,
            op["w"].astype(dt), op["b"].astype(f32).reshape(1, w),
            tail_params["ln_2"]["scale"].astype(f32).reshape(1, w),
            tail_params["ln_2"]["bias"].astype(f32).reshape(1, w),
            mlp["c_fc"]["w"].astype(dt),
            mlp["c_fc"]["b"].astype(f32).reshape(1, hidden),
            mlp["c_proj"]["w"].astype(dt),
            mlp["c_proj"]["b"].astype(f32).reshape(1, w),
        ]
        in_specs += [
            full((b, w)), full((b, w)),
            full((w, w)), full((1, w)), full((1, w)), full((1, w)),
            full((w, hidden)), full((1, hidden)),
            full((hidden, w)), full((1, w)),
        ]
    else:
        inputs += [x]
        in_specs += [full((b, w))]
    if has_query:
        ip = query_params["in_proj"]
        inputs += [
            query_params["ln_1"]["scale"].astype(f32).reshape(1, w),
            query_params["ln_1"]["bias"].astype(f32).reshape(1, w),
            ip["w"].astype(dt), ip["b"].astype(f32).reshape(1, 2 * w),
        ]
        in_specs += [full((1, w)), full((1, w)),
                     full((w, 2 * w)), full((1, 2 * w))]

    out_shapes, out_specs = [], []
    if has_tail:
        out_shapes.append(jax.ShapeDtypeStruct((b, w), dt))
        out_specs.append(full((b, w)))
    if has_query:
        out_shapes.append(jax.ShapeDtypeStruct((b, 2 * w), dt))
        out_specs.append(full((b, 2 * w)))

    outs = pl.pallas_call(
        functools.partial(_boundary_kernel, has_tail=has_tail,
                          has_query=has_query, width=w, hidden=hidden),
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*inputs)
    outs = list(outs) if isinstance(outs, (tuple, list)) else [outs]
    x_out = outs.pop(0) if has_tail else None
    qrow = outs.pop(0) if has_query else None
    return x_out, qrow
