"""Frozen CLIP Vision Transformer with per-layer attention K/V export.

TPU-first reimplementation of the behavior of the reference's vendored CLIP
visual tower (/root/reference/src/clip/model.py:171-294): every transformer
block exposes its head-split attention keys and values (the in-projection
outputs, *before* attention and out-projection), which the temporal decoder
consumes. Differences from the reference implementation, by design:

  * The 12 blocks are expressed as one ``lax.scan`` over stacked block
    parameters, so XLA compiles a single fused block body and the exported
    K/V arrive as one ``(layers, batch, tokens, heads, head_dim)`` array —
    ideal for static layer selection, sharding, and Pallas consumption.
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
from ..ops.attention import encoder_self_attention

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


def clip_vision_kv(
    params: Params,
    x: jax.Array,
    cfg: ViTConfig,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    keep_layers: Optional[tuple] = None,
    kv_int8: bool = False,
) -> Dict[str, jax.Array]:
    """Run the frozen tower, exporting per-layer head-split K and V.

    Returns {"k": (L, N, T, H, D), "v": (L, N, T, H, D)} where T includes the
    CLS token (callers drop index 0, cf. src/models.py:505-507). With
    ``keep_layers`` (a static tuple of layer indices) only those layers' K/V
    are written — the scan scatters each kept layer into a pre-sized
    accumulator instead of materializing all 12 layers and indexing after,
    halving the K/V HBM footprint/traffic for the canonical keep-6 config.

    With ``kv_int8`` (keep_layers only) the exported K/V are quantized to
    int8 with per-(layer, head) absmax scales ("k_scale"/"v_scale",
    (L, H)) — halving the K/V HBM footprint again vs bf16 for capacity
    (bigger batches / ViT-L); the Detector dequantizes at the consumer.

    K/V are the raw in-projection outputs before attention/out-proj — the
    exact export point of /root/reference/src/clip/model.py:185-199.
    """
    h = embed_patches(params, x, cfg, compute_dtype)
    n, t = h.shape[0], h.shape[1]

    def block_math(x: jax.Array, bp: Params):
        y = layers.layer_norm(bp["ln_1"], x)
        qkv = layers.linear(bp["attn"]["in_proj"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, t, cfg.heads, cfg.head_dim)
        k = k.reshape(n, t, cfg.heads, cfg.head_dim)
        v = v.reshape(n, t, cfg.heads, cfg.head_dim)
        attn_out = encoder_self_attention(q, k, v)
        attn_out = layers.linear(bp["attn"]["out_proj"], attn_out.reshape(n, t, cfg.width))
        x = x + attn_out
        y = layers.layer_norm(bp["ln_2"], x)
        y = layers.linear(bp["mlp"]["c_fc"], y)
        y = layers.quick_gelu(y)
        y = layers.linear(bp["mlp"]["c_proj"], y)
        return x + y, k, v

    if keep_layers is None:
        def block_fn(carry, bp):
            x2, k, v = block_math(carry, bp)
            return x2, {"k": k, "v": v}

        _, kvs = jax.lax.scan(block_fn, h, params["blocks"])
        return kvs

    nsel = len(keep_layers)
    last = max(keep_layers)
    # static per-layer scatter plan: destination slot (or 0) + keep flag
    dest = np.zeros((cfg.layers,), np.int32)
    keep = np.zeros((cfg.layers,), bool)
    for slot, layer in enumerate(keep_layers):
        dest[layer] = slot
        keep[layer] = True

    store_dtype = jnp.int8 if kv_int8 else compute_dtype
    acc_shape = (nsel, n, t, cfg.heads, cfg.head_dim)
    acc0 = {
        "k": jnp.zeros(acc_shape, store_dtype),
        "v": jnp.zeros(acc_shape, store_dtype),
    }
    if kv_int8:
        acc0["k_scale"] = jnp.zeros((nsel, cfg.heads), jnp.float32)
        acc0["v_scale"] = jnp.zeros((nsel, cfg.heads), jnp.float32)

    def quantize(f):
        """(N, T, H, D) -> int8 values + per-head scale."""
        scale = jnp.max(jnp.abs(f.astype(jnp.float32)), axis=(0, 1, 3)) + 1e-8
        q = jnp.clip(
            jnp.round(f.astype(jnp.float32) / scale[None, None, :, None] * 127.0),
            -127, 127,
        ).astype(jnp.int8)
        return q, scale

    def block_fn(carry, xs):
        x, acc = carry
        bp, d, kp = xs
        x2, k, v = block_math(x, bp)

        def write(a):
            if kv_int8:
                kq, ks = quantize(k)
                vq, vs = quantize(v)
                return {
                    "k": jax.lax.dynamic_update_index_in_dim(a["k"], kq, d, 0),
                    "v": jax.lax.dynamic_update_index_in_dim(a["v"], vq, d, 0),
                    "k_scale": jax.lax.dynamic_update_index_in_dim(a["k_scale"], ks, d, 0),
                    "v_scale": jax.lax.dynamic_update_index_in_dim(a["v_scale"], vs, d, 0),
                }
            return {
                "k": jax.lax.dynamic_update_index_in_dim(a["k"], k.astype(compute_dtype), d, 0),
                "v": jax.lax.dynamic_update_index_in_dim(a["v"], v.astype(compute_dtype), d, 0),
            }

        acc = jax.lax.cond(kp, write, lambda a: a, acc)
        return (x2, acc), None

    # Scan the full blocks strictly BEFORE the last kept layer; the last kept
    # layer only contributes its K/V, which depend on ln_1 + qkv projection —
    # its attention/MLP (and any later blocks) are dead work and skipped.
    prefix = jax.tree_util.tree_map(lambda a: a[:last], params["blocks"])
    (h, kvs), _ = jax.lax.scan(
        block_fn, (h, acc0),
        (prefix, jnp.asarray(dest[:last]), jnp.asarray(keep[:last])),
    )
    last_bp = jax.tree_util.tree_map(lambda a: a[last], params["blocks"])
    y = layers.layer_norm(last_bp["ln_1"], h)
    qkv = layers.linear(last_bp["attn"]["in_proj"], y)
    _, k_last, v_last = jnp.split(qkv, 3, axis=-1)
    k_last = k_last.reshape(n, t, cfg.heads, cfg.head_dim)
    v_last = v_last.reshape(n, t, cfg.heads, cfg.head_dim)
    slot = int(dest[last])
    if kv_int8:
        kq, ks = quantize(k_last)
        vq, vs = quantize(v_last)
        kvs = {
            "k": kvs["k"].at[slot].set(kq),
            "v": kvs["v"].at[slot].set(vq),
            "k_scale": kvs["k_scale"].at[slot].set(ks),
            "v_scale": kvs["v_scale"].at[slot].set(vs),
        }
    else:
        kvs = {
            "k": kvs["k"].at[slot].set(k_last.astype(compute_dtype)),
            "v": kvs["v"].at[slot].set(v_last.astype(compute_dtype)),
        }
    return kvs
