"""CLIP ModifiedResNet visual tower (RN50 family).

Re-architects /root/reference/src/clip/model.py:10-155 — the anti-aliased
ResNet CLIP ships alongside the ViT towers (3-conv stem with avgpool,
avgpool-prepended strided convolutions, QKV attention pooling instead of
global average pooling). The deepfake pipeline itself never selects it (no
config names an RN architecture and the decoder consumes per-layer ViT K/V),
but the upstream model file carries it, so the zero-shot surface here does
too: ``clip_resnet_features`` pairs with clip_text.zero_shot_logits exactly
like clip_vision_features does for the ViT towers.

TPU-first shape: a pure function over a nested-dict param pytree, NHWC
convolutions (XLA's native TPU layout — the torch reference is NCHW), frozen
inference BatchNorm (running stats; the tower is frozen in every CLIP use),
and the single-query attention pool written as two einsums instead of a
multi-head-attention call. Weights load from OpenAI RN checkpoints through
models/weights.py:convert_clip_resnet.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    heads: int = 32          # vision_width * 32 // 64, model.py:314
    input_resolution: int = 224
    output_dim: int = 1024

    @property
    def embed_dim(self) -> int:
        return self.width * 32  # model.py:130

    @property
    def spacial_dim(self) -> int:
        return self.input_resolution // 32


ARCHITECTURES: Dict[str, ResNetConfig] = {
    "RN50": ResNetConfig(),
    "RN101": ResNetConfig(layers=(3, 4, 23, 3), output_dim=512),
    "RN50x4": ResNetConfig(layers=(4, 6, 10, 6), width=80, heads=40,
                           input_resolution=288, output_dim=640),
    "RN50x16": ResNetConfig(layers=(6, 8, 18, 8), width=96, heads=48,
                            input_resolution=384, output_dim=768),
    "RN50x64": ResNetConfig(layers=(3, 15, 36, 10), width=128, heads=64,
                            input_resolution=448, output_dim=1024),
    # tiny geometry for tests (mirrors clip_vit's "ViT-Test"); heads follows
    # the reference's width*32//64 rule so config inference round-trips
    "RN-Test": ResNetConfig(layers=(1, 1, 1, 1), width=16, heads=8,
                            input_resolution=32, output_dim=8),
}


def _conv(params: Params, x: jax.Array, stride: int = 1,
          padding: str | int = 0) -> jax.Array:
    pad = ([(padding, padding)] * 2 if isinstance(padding, int)
           else padding)
    return jax.lax.conv_general_dilated(
        x, params["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(params: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference BatchNorm over the channel (last) axis; f32 statistics
    (torch nn.BatchNorm2d eval semantics — the tower is frozen)."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(params["var"].astype(jnp.float32) + eps)
    out = (x32 - params["mean"]) * inv * params["scale"] + params["bias"]
    return out.astype(x.dtype)


def _avg_pool(x: jax.Array, k: int) -> jax.Array:
    """nn.AvgPool2d(k): window k, stride k, VALID (floor) on NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _bottleneck(params: Params, x: jax.Array, stride: int) -> jax.Array:
    """model.py:42-55: all convs stride 1; avgpool after conv2 when
    stride > 1; the downsample branch is avgpool + 1x1 conv + bn."""
    out = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x)))
    out = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], out, padding=1)))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(params["bn3"], _conv(params["conv3"], out))
    if "downsample" in params:
        idn = x
        if stride > 1:
            idn = _avg_pool(idn, stride)
        idn = _bn(params["downsample"]["bn"], _conv(params["downsample"]["conv"], idn))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def _attn_pool(params: Params, x: jax.Array, heads: int) -> jax.Array:
    """model.py:58-91 AttentionPool2d: mean-token query over [mean; tokens]
    with separate q/k/v projections, softmax attention, c_proj."""
    n, hgrid, wgrid, c = x.shape
    toks = x.reshape(n, hgrid * wgrid, c)
    toks = jnp.concatenate([jnp.mean(toks, axis=1, keepdims=True), toks], axis=1)
    toks = toks + params["positional_embedding"].astype(toks.dtype)

    d = c // heads
    f32 = jnp.float32

    def proj(p, v):
        return (v.astype(f32) @ p["w"].astype(f32) + p["b"].astype(f32))

    q = proj(params["q_proj"], toks[:, :1])           # (N, 1, C)
    k = proj(params["k_proj"], toks)                  # (N, T, C)
    v = proj(params["v_proj"], toks)
    q = q.reshape(n, 1, heads, d)
    k = k.reshape(n, -1, heads, d)
    v = v.reshape(n, -1, heads, d)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * (d ** -0.5), k)
    probs = jax.nn.softmax(logits, axis=-1)
    pooled = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, c)
    out = pooled @ params["c_proj"]["w"].astype(f32) + params["c_proj"]["b"].astype(f32)
    return out.astype(x.dtype)


def clip_resnet_features(params: Params, x: jax.Array, cfg: ResNetConfig,
                         compute_dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
    """(N, 3, H, W) normalized frames -> (N, output_dim) pooled image
    features (model.py:141-155 forward). Channel-first input, matching the
    data layer and clip_vit.embed_patches."""
    x = jnp.transpose(x.astype(compute_dtype), (0, 2, 3, 1))  # NCHW -> NHWC
    stem = params["stem"]
    x = jax.nn.relu(_bn(stem["bn1"], _conv(stem["conv1"], x, stride=2, padding=1)))
    x = jax.nn.relu(_bn(stem["bn2"], _conv(stem["conv2"], x, padding=1)))
    x = jax.nn.relu(_bn(stem["bn3"], _conv(stem["conv3"], x, padding=1)))
    x = _avg_pool(x, 2)
    for stage, blocks in enumerate(cfg.layers):
        stage_params = params[f"layer{stage + 1}"]
        stride = 1 if stage == 0 else 2
        for b in range(blocks):
            x = _bottleneck(stage_params[b], x, stride if b == 0 else 1)
    return _attn_pool(params["attnpool"], x, cfg.heads)


def init_clip_resnet(key: jax.Array, cfg: ResNetConfig) -> Params:
    """Random init (shape-complete); real runs load OpenAI weights via
    weights.convert_clip_resnet."""
    kit = iter(jax.random.split(key, 256))

    def conv(cin, cout, k):
        std = (cin * k * k) ** -0.5
        return {"w": std * jax.random.normal(next(kit), (k, k, cin, cout), jnp.float32)}

    def bn(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
                "mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32)}

    def bottleneck(cin, planes, stride):
        p = {
            "conv1": conv(cin, planes, 1), "bn1": bn(planes),
            "conv2": conv(planes, planes, 3), "bn2": bn(planes),
            "conv3": conv(planes, planes * 4, 1), "bn3": bn(planes * 4),
        }
        if stride > 1 or cin != planes * 4:
            p["downsample"] = {"conv": conv(cin, planes * 4, 1), "bn": bn(planes * 4)}
        return p

    w = cfg.width
    params: Params = {
        "stem": {
            "conv1": conv(3, w // 2, 3), "bn1": bn(w // 2),
            "conv2": conv(w // 2, w // 2, 3), "bn2": bn(w // 2),
            "conv3": conv(w // 2, w, 3), "bn3": bn(w),
        }
    }
    cin = w
    for stage, blocks in enumerate(cfg.layers):
        planes = w * (2 ** stage)
        stride = 1 if stage == 0 else 2
        stage_list = []
        for b in range(blocks):
            stage_list.append(bottleneck(cin, planes, stride if b == 0 else 1))
            cin = planes * 4
        params[f"layer{stage + 1}"] = stage_list

    c = cfg.embed_dim
    t = cfg.spacial_dim ** 2 + 1

    def lin(cin_, cout_):
        std = cin_ ** -0.5
        return {"w": std * jax.random.normal(next(kit), (cin_, cout_), jnp.float32),
                "b": jnp.zeros((cout_,), jnp.float32)}

    params["attnpool"] = {
        "positional_embedding": (c ** -0.5)
        * jax.random.normal(next(kit), (t, c), jnp.float32),
        "q_proj": lin(c, c), "k_proj": lin(c, c), "v_proj": lin(c, c),
        "c_proj": lin(c, cfg.output_dim),
    }
    return params
