"""DINO projection head: MLP bottleneck -> L2-normalize -> weight-normed
prototype layer (behavioral equivalent of dinov2/layers/dino_head.py:13-59)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models import layers

Params = Dict[str, Any]


def init_dino_head(key: jax.Array, in_dim: int, out_dim: int,
                   hidden_dim: int = 2048, bottleneck_dim: int = 256,
                   n_layers: int = 3) -> Params:
    ks = jax.random.split(key, n_layers + 1)
    mlp = []
    dims = [in_dim] + [hidden_dim] * (n_layers - 1) + [bottleneck_dim]
    for i in range(n_layers):
        mlp.append(layers.init_linear(ks[i], dims[i], dims[i + 1], std=0.02))
    # weight-normed last layer: direction v (normalized at apply) + scale g=1
    v = jax.random.normal(ks[-1], (bottleneck_dim, out_dim), jnp.float32) * 0.02
    return {"mlp": mlp, "last_v": v, "last_g": jnp.ones((out_dim,), jnp.float32)}


def apply_dino_head(params: Params, x: jax.Array) -> jax.Array:
    """(N, in_dim) -> prototype logits (N, out_dim)."""
    h = x
    n = len(params["mlp"])
    for i, lin in enumerate(params["mlp"]):
        h = layers.linear(lin, h)
        if i < n - 1:
            h = jax.nn.gelu(h, approximate=False)
    # L2-normalize the bottleneck, then weight-normed prototypes
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)
    v = params["last_v"]
    v = v / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-8)
    return (h @ v) * params["last_g"]
