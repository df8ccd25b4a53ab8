"""Shared functional neural-net primitives.

Pure functions over parameter pytrees — the building blocks for the frozen
encoders and the decoder head. Matches the reference's numerical conventions:
LayerNorm always computed in float32 regardless of activation dtype
(cf. /root/reference/src/clip/model.py:157-163) and QuickGELU
(cf. /root/reference/src/clip/model.py:166-168).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def layer_norm(params: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in fp32, cast back."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def linear(params: Params, x: jax.Array) -> jax.Array:
    """x @ w (+ b). Weights stored (in_dim, out_dim)."""
    y = x @ params["w"].astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def linear_w8a8(params: Params, x: jax.Array) -> jax.Array:
    """x @ w (+ b) on the int8 MXU path: dynamic per-token activation
    scales x per-out-channel weight scales, f32 dequant epilogue.

    The measured int8 GEMM advantage at encoder shapes is ~1.5x bf16
    (PERF.md round-2 roofline); this is the opt-in W8A8 compute path
    (op_mode.compute_int8) for the frozen encoder — weights stay fp32 in
    the checkpoint and quantize at trace time (one cheap absmax pass,
    constant-folded into the graph where XLA can).
    """
    if "wq" in params:  # pre-quantized (clip_vit.prepare_int8_params)
        wq, w_scale = params["wq"], params["ws"]
    else:
        w = params["w"].astype(jnp.float32)
        w_scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) + 1e-8  # (1, N)
        wq = jnp.round(w / w_scale * 127.0).astype(jnp.int8)

    x32 = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) + 1e-8   # (..., 1)
    xq = jnp.clip(jnp.round(x32 / x_scale * 127.0), -127, 127).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale / 127.0) * (w_scale / 127.0)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def dropout(x: jax.Array, rate: float, rng: jax.Array | None, train: bool) -> jax.Array:
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# -- initializers -------------------------------------------------------------

def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_linear(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True,
                std: float | None = None) -> Params:
    if std is None:
        std = in_dim ** -0.5
    kw, _ = jax.random.split(key)
    p: Params = {"w": std * jax.random.normal(kw, (in_dim, out_dim), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p
