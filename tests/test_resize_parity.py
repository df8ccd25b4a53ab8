"""Device-transform parity vs torch: the reference resizes with torchvision
bicubic (+antialias on tensor inputs in v2); our device path uses
jax.image.resize. Pin the difference so AUROC-relevant drift is visible."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from dfd_clip_tpu.ops.image_ops import resize_crop_normalize, resize_shorter_side


def test_bicubic_downscale_matches_torch_antialias(rng):
    """250^2 -> 224^2 (the FFPP crop -> CLIP input path)."""
    img = rng.integers(0, 255, (3, 250, 250), dtype=np.uint8).astype(np.float32)

    ours = np.asarray(resize_shorter_side(jnp.asarray(img), 224))

    t = torch.from_numpy(img)[None]
    want = torch.nn.functional.interpolate(
        t, size=(224, 224), mode="bicubic", antialias=True
    )[0].numpy()

    diff = np.abs(ours - want)
    # we replicate torch's a=-0.75 antialiased kernel exactly (modulo edge
    # clamping accumulation order): near-bit parity
    assert diff.mean() < 0.05, diff.mean()
    assert diff.max() < 1.0, diff.max()


def test_upscale_matches_torch(rng):
    """150^2 -> 224^2 (the small-crop preprocessing variant)."""
    img = rng.integers(0, 255, (3, 150, 150), dtype=np.uint8).astype(np.float32)
    ours = np.asarray(resize_shorter_side(jnp.asarray(img), 224))
    t = torch.from_numpy(img)[None]
    want = torch.nn.functional.interpolate(
        t, size=(224, 224), mode="bicubic", antialias=False
    )[0].numpy()
    diff = np.abs(ours - want)
    assert diff.mean() < 0.05, diff.mean()
    assert diff.max() < 1.0, diff.max()


def test_normalize_constants(rng):
    from dfd_clip_tpu.models.detector import CLIP_MEAN, CLIP_STD

    x = rng.integers(0, 255, (3, 224, 224), dtype=np.uint8)
    out = np.asarray(resize_crop_normalize(jnp.asarray(x), 224, CLIP_MEAN, CLIP_STD))
    want = (x.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN)[:, None, None]) / \
        np.asarray(CLIP_STD)[:, None, None]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
