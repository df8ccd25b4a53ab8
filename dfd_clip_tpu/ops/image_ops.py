"""Device-side image transform ops.

The reference runs resize->center-crop->normalize on the CPU inside the
dataloader (/root/reference/src/models.py:756-780 via torchvision). Here the
transform is an XLA-compiled part of the forward program: the host ships raw
uint8 frames (4x less PCIe/HBM traffic than fp32) and the device does bicubic
resize + crop + normalization fused into the first conv's input.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def resize_shorter_side(x: jax.Array, size: int, method: str = "bicubic") -> jax.Array:
    """Resize (..., C, H, W) so the shorter spatial side equals ``size``."""
    *lead, c, h, w = x.shape
    if h <= w:
        new_h, new_w = size, max(size, round(size * w / h))
    else:
        new_h, new_w = max(size, round(size * h / w)), size
    if (new_h, new_w) == (h, w):
        return x
    return jax.image.resize(x, (*lead, c, new_h, new_w), method=method)


def center_crop(x: jax.Array, size: int) -> jax.Array:
    """Center crop (..., C, H, W) to (..., C, size, size)."""
    h, w = x.shape[-2], x.shape[-1]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top : top + size, left : left + size]


def resize_crop_normalize(
    x: jax.Array,
    size: int,
    mean: Sequence[float],
    std: Sequence[float],
) -> jax.Array:
    """uint8 (..., 3, H, W) -> normalized float32 (..., 3, size, size).

    Semantics of the reference transform (src/models.py:762-768): bicubic
    resize of the shorter side to ``size``, center crop, scale to [0,1],
    channel normalize.
    """
    x = x.astype(jnp.float32) / 255.0
    x = resize_shorter_side(x, size)
    x = center_crop(x, size)
    mean_a = jnp.asarray(mean, jnp.float32).reshape((3, 1, 1))
    std_a = jnp.asarray(std, jnp.float32).reshape((3, 1, 1))
    return (x - mean_a) / std_a
