"""Frozen DINOv2 Vision Transformer with per-layer K/V export.

Alternate backbone behind the same encoder interface as clip_vit
(cf. /root/reference/src/models.py:364-391 and
dinov2/models/vision_transformer.py:221-244): patch-14 ViT with LayerScale
(init_values=1.0), exact GELU MLP, biased qkv projection, and per-block
head-split K/V capture before attention/out-projection
(dinov2/layers/attention.py:66-85).

Like clip_vit, the block stack is a single ``lax.scan`` and K/V come back as
``(layers, batch, tokens, heads, head_dim)``. The positional embedding is
stored at the *working* grid size — the torch->jax converter performs the
reference's bicubic interpolation (vision_transformer.py:165-189) once at
load time, since input resolution is static under jit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import layers
from .clip_vit import ViTConfig
from ..ops.attention import encoder_self_attention

Params = Dict[str, Any]

# The reference always builds vit_base(patch=14) regardless of the config's
# architecture string (src/models.py:368); map common strings to it. The
# full family matches dinov2/models/vision_transformer.py:314-366
# (vit_small/base/large/giant2; giant2 ships with the fused-SwiGLU FFN).
DINOV2_S14 = ViTConfig(
    input_resolution=224, patch_size=14, width=384, layers=12, heads=6, output_dim=384
)
DINOV2_B14 = ViTConfig(
    input_resolution=224, patch_size=14, width=768, layers=12, heads=12, output_dim=768
)
DINOV2_L14 = ViTConfig(
    input_resolution=224, patch_size=14, width=1024, layers=24, heads=16, output_dim=1024
)
DINOV2_G14 = ViTConfig(
    input_resolution=224, patch_size=14, width=1536, layers=40, heads=24,
    output_dim=1536, ffn_layer="swiglufused",
)

ARCHITECTURES = {
    "ViT-B/16": DINOV2_B14,  # reference configs keep this string for dinov2
    "ViT-S/14": DINOV2_S14,
    "ViT-B/14": DINOV2_B14,
    "ViT-L/14": DINOV2_L14,
    "ViT-g/14": DINOV2_G14,
    # tiny tower for smoke tests / CI
    "ViT-Test": ViTConfig(
        input_resolution=28, patch_size=14, width=32, layers=2, heads=2, output_dim=32
    ),
    "ViT-Test-SwiGLU": ViTConfig(
        input_resolution=28, patch_size=14, width=32, layers=2, heads=2,
        output_dim=32, ffn_layer="swiglufused",
    ),
}


def init_ffn(key: jax.Array, cfg: ViTConfig, std: float) -> Params:
    """FFN params for the configured family (mlp | swiglufused)."""
    k1, k2 = jax.random.split(key)
    w = cfg.width
    if cfg.ffn_layer == "swiglufused":
        hidden = cfg.swiglu_hidden
        return {
            "w12": layers.init_linear(k1, w, 2 * hidden, std=std),
            "w3": layers.init_linear(k2, hidden, w, std=std),
        }
    if cfg.ffn_layer != "mlp":
        raise NotImplementedError(f"ffn_layer: {cfg.ffn_layer}")
    return {
        "c_fc": layers.init_linear(k1, w, 4 * w, std=std),
        "c_proj": layers.init_linear(k2, 4 * w, w, std=std),
    }


def apply_ffn(mlp: Params, y: jax.Array) -> jax.Array:
    """Exact-GELU MLP or fused SwiGLU (silu(x1) * x2 -> w3), keyed on params."""
    if "w12" in mlp:
        x12 = layers.linear(mlp["w12"], y)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return layers.linear(mlp["w3"], jax.nn.silu(x1) * x2)
    y = layers.linear(mlp["c_fc"], y)
    y = jax.nn.gelu(y, approximate=False)
    return layers.linear(mlp["c_proj"], y)


def init_dinov2(key: jax.Array, cfg: ViTConfig) -> Params:
    keys = jax.random.split(key, 5)
    w = cfg.width
    scale = 0.02

    def init_block(k: jax.Array) -> Params:
        ks = jax.random.split(k, 3)
        return {
            "ln_1": layers.init_layer_norm(w),
            "attn": {
                "in_proj": layers.init_linear(ks[0], w, 3 * w, std=scale),
                "out_proj": layers.init_linear(ks[1], w, w, std=scale),
            },
            "ls1": jnp.ones((w,), jnp.float32),
            "ln_2": layers.init_layer_norm(w),
            "mlp": init_ffn(ks[2], cfg, std=scale),
            "ls2": jnp.ones((w,), jnp.float32),
        }

    block_keys = jax.random.split(keys[3], cfg.layers)
    blocks = [init_block(k) for k in block_keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "conv1": {
            "w": scale * jax.random.normal(
                keys[0], (cfg.patch_size, cfg.patch_size, 3, w), jnp.float32
            ),
            "b": jnp.zeros((w,), jnp.float32),
        },
        "class_embedding": scale * jax.random.normal(keys[1], (w,), jnp.float32),
        "mask_token": jnp.zeros((w,), jnp.float32),
        "positional_embedding": scale
        * jax.random.normal(keys[2], (cfg.num_tokens, w), jnp.float32),
        "blocks": stacked,
        "ln_post": layers.init_layer_norm(w),
    }


def _embed(params: Params, x: jax.Array, cfg: ViTConfig, compute_dtype,
           masks: jax.Array | None = None) -> jax.Array:
    """Patch-embed + optional iBOT mask-token substitution + CLS + pos."""
    x = x.astype(compute_dtype)
    x = jnp.transpose(x, (0, 2, 3, 1))
    w = params["conv1"]["w"].astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(x.shape[0], -1, cfg.width) + params["conv1"]["b"].astype(compute_dtype)
    if masks is not None:
        # masks: (N, P) bool — replace masked patch embeddings with the mask
        # token (dinov2/models/vision_transformer.py:191-200 behavior)
        mt = params["mask_token"].astype(compute_dtype)
        x = jnp.where(masks[..., None], mt, x)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype), (x.shape[0], 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = _pos_embed_for(params["positional_embedding"], x.shape[1], cfg)
    return x + pos.astype(compute_dtype)


def _pos_embed_for(pos: jax.Array, n_tokens: int, cfg: ViTConfig) -> jax.Array:
    """Positional embedding for an arbitrary (static) token count: spatial
    bicubic interpolation of the patch grid, CLS kept
    (dinov2/models/vision_transformer.py:165-189 behavior). Needed for SSL
    local crops, whose grid differs from the pretraining grid."""
    if n_tokens == pos.shape[0]:
        return pos
    src_grid = int(round((pos.shape[0] - 1) ** 0.5))
    dst_grid = int(round((n_tokens - 1) ** 0.5))
    cls_pos = pos[:1]
    grid = pos[1:].reshape(src_grid, src_grid, -1)
    # antialias=False: torch F.interpolate(bicubic) does not antialias, and
    # local crops DOWNSCALE the grid, where antialiasing changes the result
    # materially (reference interpolate_pos_encoding parity)
    grid = jax.image.resize(grid, (dst_grid, dst_grid, grid.shape[-1]),
                            "bicubic", antialias=False)
    return jnp.concatenate([cls_pos, grid.reshape(dst_grid * dst_grid, -1)], axis=0)


def _block(bp: Params, h: jax.Array, cfg: ViTConfig,
           dp1: jax.Array | float = 1.0, dp2: jax.Array | float = 1.0) -> jax.Array:
    """dp1/dp2: per-sample stochastic-depth keep masks (pre-scaled)."""
    y = layers.layer_norm(bp["ln_1"], h)
    qkv = layers.linear(bp["attn"]["in_proj"], y)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    n, t, _ = q.shape
    q = q.reshape(n, t, cfg.heads, cfg.head_dim)
    k = k.reshape(n, t, cfg.heads, cfg.head_dim)
    v = v.reshape(n, t, cfg.heads, cfg.head_dim)
    attn_out = encoder_self_attention(q, k, v).reshape(n, t, cfg.width)
    attn_out = layers.linear(bp["attn"]["out_proj"], attn_out)
    h = h + dp1 * bp["ls1"].astype(h.dtype) * attn_out
    y = layers.layer_norm(bp["ln_2"], h)
    y = apply_ffn(bp["mlp"], y)
    return h + dp2 * bp["ls2"].astype(h.dtype) * y


def dinov2_forward(
    params: Params,
    x: jax.Array,
    cfg: ViTConfig,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    masks: jax.Array | None = None,
    drop_path_rate: float = 0.0,
    rng: jax.Array | None = None,
    remat: bool = False,
) -> Dict[str, jax.Array]:
    """Full tower forward for SSL/eval: returns normalized CLS and patch
    tokens ({"cls": (N, W), "patch": (N, P, W)}), with optional iBOT patch
    masking (dinov2/models/vision_transformer.py:202-244 behavior) and
    per-sample stochastic depth on both residual branches
    (dinov2/layers/drop_path.py semantics) when ``drop_path_rate`` > 0.

    ``remat``: rematerialize each scanned block in the backward pass
    (jax.checkpoint on the scan body — the torch reference relies on
    xFormers' memory-efficient attention for the same HBM relief). Saves
    only the per-layer carry instead of every block intermediate: the
    standard trade of ~1/3 more forward FLOPs for O(layers) less live
    activation memory, which is what lets ViT-L/giant2 SSL batches fit a
    16 GB v5e chip. Differentiated paths only — the teacher forward should
    keep remat=False (no backward, recompute would be pure waste)."""
    h = _embed(params, x, cfg, compute_dtype, masks)

    if drop_path_rate > 0.0 and rng is not None:
        n = h.shape[0]
        keep = 1.0 - drop_path_rate
        layer_keys = jax.random.split(rng, cfg.layers)

        def body(carry, xs):
            bp, key = xs
            k1, k2 = jax.random.split(key)
            m1 = jax.random.bernoulli(k1, keep, (n, 1, 1)).astype(carry.dtype) / keep
            m2 = jax.random.bernoulli(k2, keep, (n, 1, 1)).astype(carry.dtype) / keep
            return _block(bp, carry, cfg, m1, m2), None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, (params["blocks"], layer_keys))
    else:
        def body(carry, bp):
            return _block(bp, carry, cfg), None

        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, params["blocks"])
    h = layers.layer_norm(params["ln_post"], h)
    return {"cls": h[:, 0].astype(jnp.float32), "patch": h[:, 1:].astype(jnp.float32)}


def dinov2_kv(
    params: Params,
    x: jax.Array,
    cfg: ViTConfig,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    keep_layers=None,
    drop_cls: bool = False,
) -> Dict[str, jax.Array]:
    """{"k","v"}: (L, N, T, H, D) with CLS at token 0 (callers drop it) —
    or pre-dropped at the accumulator write when ``drop_cls`` (saves the
    consumer's full-stream slice copy, same as clip_vit).

    ``keep_layers`` (static tuple) scatters only those layers' K/V into the
    output accumulator — same memory optimization as clip_vit."""
    import numpy as np

    x = x.astype(compute_dtype)
    x = jnp.transpose(x, (0, 2, 3, 1))
    w = params["conv1"]["w"].astype(compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x.reshape(x.shape[0], -1, cfg.width) + params["conv1"]["b"].astype(compute_dtype)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype), (x.shape[0], 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(compute_dtype)
    n, t = x.shape[0], x.shape[1]

    def block_math(h: jax.Array, bp: Params):
        y = layers.layer_norm(bp["ln_1"], h)
        qkv = layers.linear(bp["attn"]["in_proj"], y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, t, cfg.heads, cfg.head_dim)
        k = k.reshape(n, t, cfg.heads, cfg.head_dim)
        v = v.reshape(n, t, cfg.heads, cfg.head_dim)
        attn_out = encoder_self_attention(q, k, v).reshape(n, t, cfg.width)
        attn_out = layers.linear(bp["attn"]["out_proj"], attn_out)
        h = h + bp["ls1"].astype(h.dtype) * attn_out
        y = layers.layer_norm(bp["ln_2"], h)
        y = apply_ffn(bp["mlp"], y)
        return h + bp["ls2"].astype(h.dtype) * y, k, v

    def trim(a):
        return a[:, 1:] if drop_cls else a

    if keep_layers is None:
        def block_fn(carry, bp):
            h, k, v = block_math(carry, bp)
            return h, {"k": trim(k), "v": trim(v)}

        _, kvs = jax.lax.scan(block_fn, x, params["blocks"])
        return kvs

    nsel = len(keep_layers)
    last = max(keep_layers)
    dest = np.zeros((cfg.layers,), np.int32)
    keep = np.zeros((cfg.layers,), bool)
    for slot, layer in enumerate(keep_layers):
        dest[layer] = slot
        keep[layer] = True

    acc_shape = (nsel, n, t - 1 if drop_cls else t, cfg.heads, cfg.head_dim)
    acc0 = {
        "k": jnp.zeros(acc_shape, compute_dtype),
        "v": jnp.zeros(acc_shape, compute_dtype),
    }

    def block_fn(carry, xs):
        h, acc = carry
        bp, d, kp = xs
        h2, k, v = block_math(h, bp)

        def write(a):
            return {
                "k": jax.lax.dynamic_update_index_in_dim(
                    a["k"], trim(k).astype(compute_dtype), d, 0),
                "v": jax.lax.dynamic_update_index_in_dim(
                    a["v"], trim(v).astype(compute_dtype), d, 0),
            }

        acc = jax.lax.cond(kp, write, lambda a: a, acc)
        return (h2, acc), None

    # blocks past the last kept layer are dead work; the last kept layer
    # only needs its ln_1 + qkv projection (same trick as clip_vit)
    prefix = jax.tree_util.tree_map(lambda a: a[:last], params["blocks"])
    (h, kvs), _ = jax.lax.scan(
        block_fn, (x, acc0),
        (prefix, jnp.asarray(dest[:last]), jnp.asarray(keep[:last])),
    )
    last_bp = jax.tree_util.tree_map(lambda a: a[last], params["blocks"])
    y = layers.layer_norm(last_bp["ln_1"], h)
    qkv = layers.linear(last_bp["attn"]["in_proj"], y)
    _, k_last, v_last = jnp.split(qkv, 3, axis=-1)
    slot = int(dest[last])
    kvs = {
        "k": kvs["k"].at[slot].set(
            trim(k_last.reshape(n, t, cfg.heads, cfg.head_dim)).astype(compute_dtype)
        ),
        "v": kvs["v"].at[slot].set(
            trim(v_last.reshape(n, t, cfg.heads, cfg.head_dim)).astype(compute_dtype)
        ),
    }
    return kvs
