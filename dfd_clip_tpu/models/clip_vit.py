"""Frozen CLIP Vision Transformer with per-layer attention K/V export.

TPU-first reimplementation of the behavior of the reference's vendored CLIP
visual tower (/root/reference/src/clip/model.py:171-294): every transformer
block exposes its head-split attention keys and values (the in-projection
outputs, *before* attention and out-projection), which the temporal decoder
consumes. Differences from the reference implementation, by design:

  * The block parameters are stored stacked (``(layers, ...)`` leaves, the
    converter/checkpoint format), but the forward is an **unrolled** Python
    loop over statically-sliced per-layer weights: XLA then sees the whole
    12-block dataflow, fuses LayerNorms/residuals across block boundaries,
    dead-code-eliminates everything after the last exported layer, and the
    kept layers' K/V are collected by a plain ``jnp.stack`` instead of a
    scatter-under-``lax.cond`` in a scan (measured: the scan+scatter form
    cost ~10 ms/batch in accumulator copies at flagship shapes, PERF.md).
  * The attention kernel consumes the **packed** (N, T, 3·width) qkv
    projection directly (ops/attention.py): Pallas custom-calls cannot fuse
    producer slices, so splitting q/k/v first would materialize three
    full-stream copies per layer.
  * Activations run in a configurable compute dtype (bfloat16 by default for
    the MXU); LayerNorm stays fp32 (see layers.layer_norm).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import layers
from ..ops import attention as attention_ops
from ..ops.attention import encoder_self_attention_qkv

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static architecture description (the encoder-interface contract:
    cf. src/models.py:364-391 `.width/.heads/.input_resolution/.patch_size`)."""

    input_resolution: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    # FFN family: "mlp" (CLIP / dinov2 S,B,L) or "swiglufused" (dinov2 giant2;
    # dinov2/layers/swiglu_ffn.py:44-63). CLIP towers always use "mlp".
    ffn_layer: str = "mlp"

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def swiglu_hidden(self) -> int:
        """SwiGLUFFNFused hidden width: 2/3 of 4w, rounded up to 8
        (dinov2/layers/swiglu_ffn.py:54-57)."""
        return (int(4 * self.width * 2 / 3) + 7) // 8 * 8


VIT_B16 = ViTConfig()
VIT_L14 = ViTConfig(patch_size=14, width=1024, layers=24, heads=16, output_dim=768)
VIT_L14_336 = dataclasses.replace(VIT_L14, input_resolution=336)

ARCHITECTURES = {
    "ViT-B/16": VIT_B16,
    "ViT-B/32": dataclasses.replace(VIT_B16, patch_size=32),
    "ViT-L/14": VIT_L14,
    "ViT-L/14@336px": VIT_L14_336,
    # tiny tower for smoke tests / CI (not a real CLIP release)
    "ViT-Test": ViTConfig(
        input_resolution=32, patch_size=16, width=64, layers=3, heads=4, output_dim=32
    ),
    # production head_dim (64) at CI-speed width: guards head-slice index
    # math in the fused/tower kernels that ViT-Test's head_dim=16 cannot
    "ViT-Test-Wide": ViTConfig(
        input_resolution=32, patch_size=16, width=256, layers=3, heads=4,
        output_dim=32
    ),
}


def init_clip_vision(key: jax.Array, cfg: ViTConfig) -> Params:
    """Random init with CLIP-style scales; real runs overwrite via weights.py."""
    keys = jax.random.split(key, 6)
    scale = cfg.width ** -0.5
    w = cfg.width

    def init_block(k: jax.Array) -> Params:
        ks = jax.random.split(k, 4)
        attn_std = (2 * w) ** -0.5  # CLIP init: width**-0.5 * (2*layers)**-0.5-ish
        return {
            "ln_1": layers.init_layer_norm(w),
            "attn": {
                "in_proj": layers.init_linear(ks[0], w, 3 * w, std=attn_std),
                "out_proj": layers.init_linear(ks[1], w, w, std=attn_std),
            },
            "ln_2": layers.init_layer_norm(w),
            "mlp": {
                "c_fc": layers.init_linear(ks[2], w, 4 * w, std=scale),
                "c_proj": layers.init_linear(ks[3], 4 * w, w, std=scale),
            },
        }

    block_keys = jax.random.split(keys[4], cfg.layers)
    blocks = [init_block(k) for k in block_keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "conv1": {
            "w": scale
            * jax.random.normal(
                keys[0], (cfg.patch_size, cfg.patch_size, 3, w), jnp.float32
            )
        },
        "class_embedding": scale * jax.random.normal(keys[1], (w,), jnp.float32),
        "positional_embedding": scale
        * jax.random.normal(keys[2], (cfg.num_tokens, w), jnp.float32),
        "ln_pre": layers.init_layer_norm(w),
        "blocks": stacked,
    }


def embed_patches(params: Params, x: jax.Array, cfg: ViTConfig,
                  compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """Conv patch-embed -> [CLS; patches] + positional embedding -> ln_pre.

    Matches /root/reference/src/clip/model.py:276-292. Input x: (N, 3, H, W)
    float32 normalized frames (channel-first, matching the data layer).
    """
    x = x.astype(compute_dtype)
    # NCHW -> NHWC, conv with HWIO kernel, stride = patch.
    x = jnp.transpose(x, (0, 2, 3, 1))
    w = params["conv1"]["w"].astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(x.shape[0], -1, cfg.width)  # (N, grid^2, width)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype), (x.shape[0], 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(compute_dtype)
    x = layers.layer_norm(params["ln_pre"], x)
    return x


def _quant_kv_rows_xla(f: jax.Array):
    """(N, T', H, D) -> (int8, (N, T', 1) f32 scale); the XLA-path wrapper
    around ops.pallas_attention._quant_kv_rows (dequant = q · s) — one shared
    implementation so the scale/clip constants can't drift between the kernel
    exporter and this fallback."""
    from ..ops.pallas_attention import _quant_kv_rows

    n_, t_ = f.shape[:2]
    q, s = _quant_kv_rows(f.reshape(n_, t_, -1))
    return q.reshape(f.shape), s


def prepare_int8_params(params: Params) -> Params:
    """Pre-quantize the frozen tower's GEMM weights for compute_int8
    inference: adds stacked ("wq" int8, "ws" f32) leaves next to each linear
    "w" in the block pytree. The kernels (pallas_attention.weight_q,
    pallas_tower._stack_q, layers.linear_w8a8) pick them up and skip the
    in-graph absmax+round pass over the full f32 weight set (~340 MB of HBM
    reads per flagship predict). Runtime-only: call after loading a
    checkpoint (Detector.prepare_params); never saved."""
    from ..ops.pallas_tower import _quantize_weight_stack

    def aug(p: Params) -> Params:
        wq, ws = _quantize_weight_stack(p["w"])
        return {**p, "wq": wq, "ws": ws}

    blocks = params["blocks"]
    new_blocks = dict(blocks)
    if "attn" in blocks:
        new_blocks["attn"] = {
            **blocks["attn"],
            "in_proj": aug(blocks["attn"]["in_proj"]),
            "out_proj": aug(blocks["attn"]["out_proj"]),
        }
    if "mlp" in blocks and "c_fc" in blocks["mlp"]:
        new_blocks["mlp"] = {
            **blocks["mlp"],
            "c_fc": aug(blocks["mlp"]["c_fc"]),
            "c_proj": aug(blocks["mlp"]["c_proj"]),
        }
    return {**params, "blocks": new_blocks}


def clip_vision_kv(
    params: Params,
    x: jax.Array,
    cfg: ViTConfig,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    keep_layers: Optional[tuple] = None,
    kv_int8: bool = False,
    drop_cls: bool = False,
    compute_int8: bool = False,
    kv_int8_rows: bool = False,
    pad_tokens: bool = False,
) -> Dict[str, jax.Array]:
    """Run the frozen tower, exporting per-layer head-split K and V.

    Returns {"k": (L, N, T, H, D), "v": (L, N, T, H, D)} where T includes the
    CLS token (callers drop index 0, cf. src/models.py:505-507) unless
    ``drop_cls`` — then the CLS column is sliced off *before* the layer stack
    is materialized, so the stack write IS the final decoder-layout K/V
    buffer and the consumer's ``[:, :, 1:]`` copy (a full extra HBM
    read+write of the largest intermediate) disappears. With
    ``keep_layers`` (a static tuple of layer indices) only those layers' K/V
    are collected; blocks after the last kept layer, and the attention/MLP of
    the last kept layer itself (its K/V depend only on ln_1 + qkv), are dead
    work the unrolled graph never emits.

    With ``kv_int8`` (keep_layers only) the exported K/V are quantized to
    int8 with per-(layer, head) absmax scales ("k_scale"/"v_scale",
    (L, H)) — halving the K/V HBM footprint again vs bf16 for capacity
    (bigger batches / ViT-L); the Detector dequantizes at the consumer.

    With ``kv_int8_rows`` (op_mode kv_dtype="int8_rows") K/V are instead
    quantized PER ROW ((frame, token) over the W lanes) at the export site
    and stay int8 all the way into the decoder kernel, which dequantizes
    per tile in VMEM — halving both the encoder's export writes and every
    decoder block's K/V reads (~1.9 ms each at flagship shapes). Returns
    extra "k_scale"/"v_scale" (Lsel, N, T', 1) f32 with dequant = q · s.

    K/V are the raw in-projection outputs before attention/out-proj — the
    exact export point of /root/reference/src/clip/model.py:185-199.

    With ``pad_tokens`` the exported token axis is zero-padded up to a
    multiple of 8 (CLIP-B: 196 -> 200) so the consumer's (.., T, P, ..) ->
    (.., T*P, ..) merge is a tiled-layout BITCAST instead of a materialized
    copy (2 x 1.78 ms/batch at flagship shapes, PERF_r4 predict trace). Pad
    rows are zeros; the decoder masks them as keys via ``patch_valid``
    (models/decoder.py). Inference-only: patch-coupled adapter variants
    (nln joint-LN, BN spatial stats) and per-patch training losses must not
    see pad rows (models/detector.py gates on train/adapter).
    """
    assert not (kv_int8 and kv_int8_rows), "pick one K/V quantization mode"
    h = embed_patches(params, x, cfg, compute_dtype)
    n, t = h.shape[0], h.shape[1]
    w = cfg.width
    kv_pad = (-(t - 1 if drop_cls else t)) % 8 if pad_tokens else 0

    keep = (
        tuple(range(cfg.layers)) if keep_layers is None else tuple(keep_layers)
    )
    last = max(keep)

    def quantize(f):
        """(N, T, H, D) -> int8 values + per-head scale."""
        scale = jnp.max(jnp.abs(f.astype(jnp.float32)), axis=(0, 1, 3)) + 1e-8
        q = jnp.clip(
            jnp.round(f.astype(jnp.float32) / scale[None, None, :, None] * 127.0),
            -127, 127,
        ).astype(jnp.int8)
        return q, scale

    # The fused-block kernels budget VMEM for ViT-B geometry: at w=1024
    # (ViT-L) the resident bf16 weights alone (qkv 6.3 MB, MLP 16.8 MB)
    # exceed the ~16 MB scoped-VMEM limit, so wide towers run the XLA
    # composition (which still uses the Pallas attention-only kernel via
    # encoder_self_attention_qkv). With int8 weights the split kernels fit
    # at w=1024 (qkv 3.1 + wo 2.1 MB; MLP 8.4 MB), so the compute_int8
    # path keeps the fused blocks for ViT-L too.
    fused = attention_ops.use_fused_blocks() and (
        cfg.width <= 768 or (compute_int8 and cfg.width <= 1024)
    )
    # Fused + plain-bf16 export writes K/V straight into slices of the final
    # (Lsel, N, T', W) accumulators (input_output_aliases, in-place): the
    # per-layer arrays and the jnp.stack copy never exist. kv_int8 needs the
    # per-layer arrays for quantization and keeps the collected path.
    import os as _os

    stacked_export = (fused and not kv_int8
                      and _os.environ.get("DFD_STACKED_EXPORT", "1") != "0")
    # rows8 quantization happens inside the export kernels, so the stacked
    # in-place path applies; the big k/v accumulators carry int8 and the
    # tiny per-layer scale outputs are stacked by this caller.
    rows8 = kv_int8_rows
    # Whole-block fusion (attention + MLP in ONE kernel, ops/pallas_attention.
    # fused_encoder_block): removes the intermediate residual stream's HBM
    # round-trip per layer. All four GEMM weight sets must be VMEM-resident at
    # once — 7.7 MB with int8 weights (fits comfortably), 14.1 MB bf16 —
    # so "auto" picks it for the int8 path and keeps the split attn/MLP
    # kernel pair for bf16 (DFD_FUSED_BLOCK=full|split overrides).
    block_mode = _os.environ.get("DFD_FUSED_BLOCK", "auto")
    if block_mode == "auto":
        # full-block int8 weights are ~7.7 MB at w=768 but ~12.7 MB at
        # w=1024 — too close to the scoped-VMEM limit with the f32
        # intermediates, so wide towers stay on the split pair.
        block_mode = "full" if (compute_int8 and cfg.width <= 768) else "split"
    # Whole-ENCODER megakernel (ops/pallas_tower.py): the full layer stack in
    # one Pallas call, grid (chunks, layers) with the residual stream carried
    # in persistent VMEM scratch — the per-layer h round-trips (~2.2 GB HBM
    # traffic per flagship predict) collapse to one read per chunk. Needs a
    # contiguous keep range (slot index affine in the layer grid index) and
    # the plain (bf16 or W8A8-compute) export modes. Opt-in until the chip
    # A/B lands (DFD_MEGAKERNEL=1).
    keep_sorted = tuple(sorted(keep))
    if (
        fused
        and not kv_int8
        and not rows8
        and _os.environ.get("DFD_MEGAKERNEL", "0") == "1"
        and keep == keep_sorted == tuple(range(keep_sorted[0], last + 1))
    ):
        from ..ops.pallas_tower import fused_encoder_tower

        k, v = fused_encoder_tower(
            h, params["blocks"], cfg.heads, cfg.head_dim,
            keep=keep_sorted, drop_cls=drop_cls, int8_gemm=compute_int8,
        )
        tt = t - 1 if drop_cls else t
        return {
            "k": k.reshape(len(keep), n, tt, cfg.heads, cfg.head_dim
                           ).astype(compute_dtype),
            "v": v.reshape(len(keep), n, tt, cfg.heads, cfg.head_dim
                           ).astype(compute_dtype),
        }
    full_block = (fused and block_mode == "full"
                  and _os.environ.get("DFD_FUSED_MLP", "1") != "0")
    slot_of = {layer: s for s, layer in enumerate(keep)}
    nsel = len(keep)
    kacc = vacc = None
    # fresh-acc default: ON for the int8 whole-block path — the round-3 chip
    # ladder's winning composition ("ctl full-phase bf=2", 51.8 ms / 309
    # clips/s, PERF.md session 10) runs with it, and the driver-day bench
    # must measure the winner by default, not 3.5% under it (round-3 verdict
    # weak #1). The bf16/split paths keep the zero-init form, whose Mosaic
    # VMEM accounting is the proven-reliable one at frames=4 (note below).
    fresh_acc = _os.environ.get(
        "DFD_FRESH_ACC", "1" if (full_block and compute_int8) else "0") == "1"
    if stacked_export and not fresh_acc:
        # zero-init accumulators (one pass over the K/V footprint). An
        # uninitialized-buffer allocation (no-op ANY-space pallas outputs)
        # was tried and compiles to the same kernels, but nudges Mosaic's
        # scoped-VMEM accounting over the 16 MB limit at frames=4 — the
        # zeros form is the one that reliably compiles. DFD_FRESH_ACC=1
        # instead lets the FIRST kept layer's export call emit the
        # accumulators as fresh outputs (later layers alias into them),
        # skipping this pass — A/B it per kernel config (the fresh form's
        # Mosaic VMEM accounting differs, see the round-2 note above).
        tt = (t - 1 if drop_cls else t) + kv_pad
        kv_dt = jnp.int8 if rows8 else h.dtype
        kacc = jnp.zeros((nsel, n, tt, w), kv_dt)
        vacc = jnp.zeros((nsel, n, tt, w), kv_dt)
    collected: Dict[int, tuple] = {}
    scales: Dict[int, tuple] = {}
    for i in range(last + 1):
        bp = jax.tree_util.tree_map(lambda a: a[i], params["blocks"])
        k = v = None
        if fused:
            # One Pallas call runs LN1 + qkv GEMM + attention + out-proj
            # (+ the K/V export, CLS-dropped, straight out of VMEM); the
            # packed qkv stream never touches HBM. The last kept layer only
            # needs LN1 + qkv, so it runs the export-only kernel variant.
            from ..ops.pallas_attention import (
                fused_encoder_attn_block,
                fused_encoder_block,
            )

            into = (
                (kacc, vacc, slot_of[i], nsel)
                if stacked_export and i in keep else None
            )
            if i == last:
                out = fused_encoder_attn_block(
                    h, bp["ln_1"], bp["attn"], cfg.heads, cfg.head_dim,
                    drop_cls=drop_cls, last_only=True, export_into=into,
                    int8_gemm=compute_int8, kv_rows8=rows8, kv_pad=kv_pad,
                )
                if rows8:
                    scales[i] = out[2:4]
                    out = out[:2]
                if stacked_export:
                    kacc, vacc = out
                else:
                    k, v = out
            elif full_block:
                # whole block (attn + MLP + optional export) in one call
                out = fused_encoder_block(
                    h, bp["ln_1"], bp["attn"], bp["ln_2"], bp["mlp"],
                    cfg.heads, cfg.head_dim,
                    export=i in keep, drop_cls=drop_cls, export_into=into,
                    int8_gemm=compute_int8, kv_rows8=rows8, kv_pad=kv_pad,
                )
                if i in keep:
                    if rows8:
                        scales[i] = out[3:5]
                        out = out[:3]
                    if stacked_export:
                        h, kacc, vacc = out
                    else:
                        h, k, v = out
                else:
                    h = out
            elif i in keep:
                out = fused_encoder_attn_block(
                    h, bp["ln_1"], bp["attn"], cfg.heads, cfg.head_dim,
                    export=True, drop_cls=drop_cls, export_into=into,
                    int8_gemm=compute_int8, kv_rows8=rows8, kv_pad=kv_pad,
                )
                if rows8:
                    scales[i] = out[3:5]
                    out = out[:3]
                if stacked_export:
                    h, kacc, vacc = out
                else:
                    h, k, v = out
            else:
                h = fused_encoder_attn_block(
                    h, bp["ln_1"], bp["attn"], cfg.heads, cfg.head_dim,
                    int8_gemm=compute_int8,
                )
        else:
            # compute_int8 quantizes the same GEMMs as the fused kernels (qkv
            # in-projection + both MLP GEMMs + the attention out-proj, which
            # the kernels run W8A8 under DFD_INT8_WO=1, the default) so the
            # two paths share numerics and the CPU drift test bounds the
            # composition TPU actually runs.
            lin = layers.linear_w8a8 if compute_int8 else layers.linear
            int8_wo = (compute_int8
                       and _os.environ.get("DFD_INT8_WO", "1") == "1")
            lin_wo = layers.linear_w8a8 if int8_wo else layers.linear
            y = layers.layer_norm(bp["ln_1"], h)
            qkv = lin(bp["attn"]["in_proj"], y)  # (N, T, 3W) packed
            if i in keep:
                src = qkv[:, 1:] if drop_cls else qkv
                tt = t - 1 if drop_cls else t
                k = src[..., w : 2 * w].reshape(n, tt, cfg.heads, cfg.head_dim)
                v = src[..., 2 * w :].reshape(n, tt, cfg.heads, cfg.head_dim)
                if kv_pad:
                    # shape parity with the kernels' zero-row export pad
                    padw = ((0, 0), (0, kv_pad), (0, 0), (0, 0))
                    k = jnp.pad(k, padw)
                    v = jnp.pad(v, padw)
            if i < last:
                attn_out = encoder_self_attention_qkv(qkv, cfg.heads, cfg.head_dim)
                h = h + lin_wo(bp["attn"]["out_proj"], attn_out)
        if k is not None:
            if kv_int8:
                collected[i] = quantize(k) + quantize(v)  # (kq, ks, vq, vs)
            elif rows8 and not fused:
                # XLA composition of the kernels' per-row export quant
                kq, ks = _quant_kv_rows_xla(k)
                vq, vs = _quant_kv_rows_xla(v)
                collected[i] = (kq, vq)
                scales[i] = (ks, vs)
            elif rows8:
                collected[i] = (k, v)  # already int8 from the kernel
            else:
                collected[i] = (k.astype(compute_dtype), v.astype(compute_dtype))
        if i < last:
            if fused and full_block:
                continue  # MLP already applied inside fused_encoder_block
            if fused and _os.environ.get("DFD_FUSED_MLP", "1") != "0":
                # the MLP half in one Pallas call too: LN2 + c_fc + QuickGELU
                # + c_proj + residual with the (T, 4W) intermediate in VMEM.
                # Measured same-process A/B at flagship shapes: predict
                # 94.5 -> 87.2 ms (DFD_FUSED_MLP=0 opts out). With
                # compute_int8 both GEMMs run W8A8 in-kernel.
                from ..ops.pallas_attention import fused_encoder_mlp_block

                h = fused_encoder_mlp_block(h, bp["ln_2"], bp["mlp"],
                                            int8_gemm=compute_int8)
                continue
            # op_mode.compute_int8: W8A8 on the MLP GEMMs (measured ~1.5x the
            # bf16 MXU at c_fc shapes, PERF.md round-2 roofline; accuracy
            # drift bounded in tests/test_models.py::test_compute_int8_drift)
            lin = layers.linear_w8a8 if compute_int8 else layers.linear
            y = layers.layer_norm(bp["ln_2"], h)
            y = lin(bp["mlp"]["c_fc"], y)
            y = layers.quick_gelu(y)
            h = h + lin(bp["mlp"]["c_proj"], y)

    if kv_int8:
        return {
            "k": jnp.stack([collected[i][0] for i in keep]),
            "k_scale": jnp.stack([collected[i][1] for i in keep]),
            "v": jnp.stack([collected[i][2] for i in keep]),
            "v_scale": jnp.stack([collected[i][3] for i in keep]),
        }
    if rows8:
        out = (
            {
                "k": kacc.reshape(nsel, n, -1, cfg.heads, cfg.head_dim),
                "v": vacc.reshape(nsel, n, -1, cfg.heads, cfg.head_dim),
            }
            if stacked_export
            else {
                "k": jnp.stack([collected[i][0] for i in keep]),
                "v": jnp.stack([collected[i][1] for i in keep]),
            }
        )
        out["k_scale"] = jnp.stack([scales[i][0] for i in keep])
        out["v_scale"] = jnp.stack([scales[i][1] for i in keep])
        return out
    if stacked_export:
        tt = (t - 1 if drop_cls else t) + kv_pad
        return {
            "k": kacc.reshape(nsel, n, tt, cfg.heads, cfg.head_dim
                              ).astype(compute_dtype),
            "v": vacc.reshape(nsel, n, tt, cfg.heads, cfg.head_dim
                              ).astype(compute_dtype),
        }
    return {
        "k": jnp.stack([collected[i][0] for i in keep]),
        "v": jnp.stack([collected[i][1] for i in keep]),
    }
