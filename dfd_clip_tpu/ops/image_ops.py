"""Device-side image transform ops.

The reference runs resize->center-crop->normalize on the CPU inside the
dataloader (/root/reference/src/models.py:756-780 via torchvision). Here the
transform is an XLA-compiled part of the forward program: the host ships raw
uint8 frames (4x less PCIe/HBM traffic than fp32) and the device does bicubic
resize + crop + normalization fused into the first conv's input.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _torch_cubic(t: "np.ndarray", a: float = -0.75) -> "np.ndarray":
    """PyTorch's bicubic kernel (a = -0.75; jax uses the Keys a = -0.5)."""
    import numpy as np

    t = np.abs(t)
    out = np.zeros_like(t)
    m1 = t <= 1
    out[m1] = (a + 2) * t[m1] ** 3 - (a + 3) * t[m1] ** 2 + 1
    m2 = (t > 1) & (t < 2)
    out[m2] = a * t[m2] ** 3 - 5 * a * t[m2] ** 2 + 8 * a * t[m2] - 4 * a
    return out


@functools.lru_cache(maxsize=64)
def _bicubic_matrix(in_size: int, out_size: int) -> "np.ndarray":
    """(out, in) interpolation weights matching torch's antialiased bicubic
    (torchvision's tensor-backend resize — the reference's transform)."""
    import numpy as np

    scale = in_size / out_size
    antialias = scale > 1.0
    # torch's antialias resize follows PIL: cubic a=-0.5 with the kernel
    # stretched by the scale; the non-antialias path is torch's a=-0.75.
    a = -0.5 if antialias else -0.75
    support = 2.0 * (scale if antialias else 1.0)
    centers = (np.arange(out_size) + 0.5) * scale - 0.5
    w = np.zeros((out_size, in_size), np.float32)
    for i, c in enumerate(centers):
        lo = int(np.floor(c - support)) + 1
        hi = int(np.ceil(c + support))
        idx = np.clip(np.arange(lo, hi + 1), 0, in_size - 1)
        t = (np.arange(lo, hi + 1) - c) / (scale if antialias else 1.0)
        kw = _torch_cubic(t, a)
        np.add.at(w[i], idx, kw)
    w /= w.sum(axis=1, keepdims=True)
    return w


def resize_shorter_side(x: jax.Array, size: int, method: str = "bicubic") -> jax.Array:
    """Resize (..., C, H, W) so the shorter spatial side equals ``size``.

    Bicubic uses precomputed torch-matched interpolation matrices (sizes are
    static under jit) applied as two matmuls — bit-near torchvision's
    antialiased bicubic, and MXU-friendly.
    """
    *lead, c, h, w = x.shape
    if h <= w:
        new_h, new_w = size, max(size, round(size * w / h))
    else:
        new_h, new_w = max(size, round(size * h / w)), size
    if (new_h, new_w) == (h, w):
        return x
    if method != "bicubic":
        return jax.image.resize(x, (*lead, c, new_h, new_w), method=method)
    wh = jnp.asarray(_bicubic_matrix(h, new_h))  # (new_h, h)
    ww = jnp.asarray(_bicubic_matrix(w, new_w))  # (new_w, w)
    y = jnp.einsum("oh,...hw->...ow", wh, x.astype(jnp.float32))
    return jnp.einsum("pw,...ow->...op", ww, y)


def center_crop(x: jax.Array, size: int) -> jax.Array:
    """Center crop (..., C, H, W) to (..., C, size, size)."""
    h, w = x.shape[-2], x.shape[-1]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top : top + size, left : left + size]


def yuv420_to_rgb(y: jax.Array, u: jax.Array, v: jax.Array,
                  full_range: bool = True) -> jax.Array:
    """Planar YUV420 uint8 -> RGB uint8 (..., 3, H, W), on device.

    The companion of the native decoder's YUV fast path: chroma is upsampled
    2x nearest (matching swscale's default for 420->444 in the RGB path
    closely enough for the training distribution) and converted with BT.601
    coefficients; ``full_range`` selects the JPEG/full-range matrix.
    """
    f32 = jnp.float32
    yf = y.astype(f32)
    # nearest 2x chroma upsample
    uu = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1).astype(f32) - 128.0
    vv = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1).astype(f32) - 128.0
    if full_range:
        yy = yf
        r = yy + 1.402 * vv
        g = yy - 0.344136 * uu - 0.714136 * vv
        b = yy + 1.772 * uu
    else:
        yy = (yf - 16.0) * (255.0 / 219.0)
        r = yy + 1.596027 * vv
        g = yy - 0.391762 * uu - 0.812968 * vv
        b = yy + 2.017232 * uu
    rgb = jnp.stack([r, g, b], axis=-3)  # (..., 3, H, W)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


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
