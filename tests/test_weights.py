"""Weight-converter tests: torch checkpoints in the OpenAI-CLIP and DINOv2
naming conventions load into the JAX models and produce matching math."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dfd_clip_tpu.models import clip_vit, dinov2_vit, weights as weights_lib


def _tiny_clip_state_dict(rng, width=64, layers=2, heads=4, patch=16, res=32,
                          prefix="visual."):
    """A state dict with the OpenAI CLIP visual-tower naming/layout."""
    g = (res // patch) ** 2 + 1
    sd = {
        f"{prefix}conv1.weight": torch.randn(width, 3, patch, patch),
        f"{prefix}class_embedding": torch.randn(width),
        f"{prefix}positional_embedding": torch.randn(g, width),
        f"{prefix}ln_pre.weight": torch.randn(width),
        f"{prefix}ln_pre.bias": torch.randn(width),
        f"{prefix}ln_post.weight": torch.randn(width),
        f"{prefix}ln_post.bias": torch.randn(width),
        f"{prefix}proj": torch.randn(width, 32),
    }
    for i in range(layers):
        b = f"{prefix}transformer.resblocks.{i}"
        sd.update({
            f"{b}.attn.in_proj_weight": torch.randn(3 * width, width),
            f"{b}.attn.in_proj_bias": torch.randn(3 * width),
            f"{b}.attn.out_proj.weight": torch.randn(width, width),
            f"{b}.attn.out_proj.bias": torch.randn(width),
            f"{b}.ln_1.weight": torch.randn(width),
            f"{b}.ln_1.bias": torch.randn(width),
            f"{b}.mlp.c_fc.weight": torch.randn(4 * width, width),
            f"{b}.mlp.c_fc.bias": torch.randn(4 * width),
            f"{b}.mlp.c_proj.weight": torch.randn(width, 4 * width),
            f"{b}.mlp.c_proj.bias": torch.randn(width),
            f"{b}.ln_2.weight": torch.randn(width),
            f"{b}.ln_2.bias": torch.randn(width),
        })
    return sd


def test_clip_checkpoint_roundtrip(tmp_path, rng):
    torch.manual_seed(0)
    sd = _tiny_clip_state_dict(rng)
    path = str(tmp_path / "clip.pt")
    torch.save(sd, path)

    params, cfg = weights_lib.load_clip_visual(path)
    assert cfg.width == 64 and cfg.layers == 2 and cfg.patch_size == 16
    assert cfg.input_resolution == 32

    # converted linear must be the transpose of torch's (out, in) layout
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["attn"]["in_proj"]["w"][0]),
        sd["visual.transformer.resblocks.0.attn.in_proj_weight"].numpy().T,
    )
    # conv OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["w"]),
        sd["visual.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )

    # the converted tower runs and matches torch's linear algebra on the
    # first qkv projection
    # head count follows the CLIP convention head_dim=64 -> heads=1 here
    assert cfg.heads == 1
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    kvs = clip_vit.clip_vision_kv(params, jnp.asarray(x), cfg, jnp.float32)
    assert kvs["k"].shape == (2, 1, 5, cfg.heads, 64)
    assert np.isfinite(np.asarray(kvs["k"])).all()


def test_clip_checkpoint_without_prefix(tmp_path, rng):
    sd = _tiny_clip_state_dict(rng, prefix="")
    path = str(tmp_path / "visual.pt")
    torch.save(sd, path)
    params, cfg = weights_lib.load_clip_visual(path)
    assert cfg.width == 64


def test_dinov2_checkpoint_roundtrip(tmp_path):
    torch.manual_seed(1)
    width, layers, patch, src_res = 32, 2, 14, 28
    src_grid = src_res // patch
    sd = {
        "patch_embed.proj.weight": torch.randn(width, 3, patch, patch),
        "patch_embed.proj.bias": torch.randn(width),
        "cls_token": torch.randn(1, 1, width),
        "mask_token": torch.randn(1, width),
        "pos_embed": torch.randn(1, src_grid * src_grid + 1, width),
        "norm.weight": torch.randn(width),
        "norm.bias": torch.randn(width),
    }
    for i in range(layers):
        b = f"blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": torch.randn(width), f"{b}.norm1.bias": torch.randn(width),
            f"{b}.attn.qkv.weight": torch.randn(3 * width, width),
            f"{b}.attn.qkv.bias": torch.randn(3 * width),
            f"{b}.attn.proj.weight": torch.randn(width, width),
            f"{b}.attn.proj.bias": torch.randn(width),
            f"{b}.ls1.gamma": torch.randn(width),
            f"{b}.norm2.weight": torch.randn(width), f"{b}.norm2.bias": torch.randn(width),
            f"{b}.mlp.fc1.weight": torch.randn(4 * width, width),
            f"{b}.mlp.fc1.bias": torch.randn(4 * width),
            f"{b}.mlp.fc2.weight": torch.randn(width, 4 * width),
            f"{b}.mlp.fc2.bias": torch.randn(width),
            f"{b}.ls2.gamma": torch.randn(width),
        })
    path = str(tmp_path / "dinov2.pth")
    torch.save(sd, path)

    cfg = clip_vit.ViTConfig(input_resolution=28, patch_size=14, width=32,
                             layers=2, heads=2, output_dim=32)
    params = weights_lib.load_dinov2(path, cfg)
    # pos embed stays (same grid -> no interpolation)
    assert params["positional_embedding"].shape == (cfg.num_tokens, width)
    out = dinov2_vit.dinov2_forward(
        params, jnp.zeros((1, 3, 28, 28)), cfg, jnp.float32
    )
    assert out["cls"].shape == (1, width)

    # interpolation path: load into a larger working grid
    cfg2 = clip_vit.ViTConfig(input_resolution=56, patch_size=14, width=32,
                              layers=2, heads=2, output_dim=32)
    params2 = weights_lib.load_dinov2(path, cfg2)
    assert params2["positional_embedding"].shape == (cfg2.num_tokens, width)


def test_framework_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6).reshape(2, 3).astype(np.float32),
            "nested": [{"b": np.ones((4,))}]}
    p = str(tmp_path / "state.pt")
    weights_lib.save_params(p, tree)
    loaded = weights_lib.load_params(p)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["nested"][0]["b"], tree["nested"][0]["b"])
