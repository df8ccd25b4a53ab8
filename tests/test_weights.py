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


def test_dinov2_swiglu_checkpoint_roundtrip(tmp_path):
    """Fused-SwiGLU (giant2-family) checkpoints convert and run; converter
    branches on the mlp.w12 keys (dinov2/layers/swiglu_ffn.py:44-63)."""
    torch.manual_seed(2)
    width, layers, patch = 32, 2, 14
    cfg = dinov2_vit.ARCHITECTURES["ViT-Test-SwiGLU"]
    hidden = cfg.swiglu_hidden
    sd = {
        "patch_embed.proj.weight": torch.randn(width, 3, patch, patch),
        "patch_embed.proj.bias": torch.randn(width),
        "cls_token": torch.randn(1, 1, width),
        "mask_token": torch.randn(1, width),
        "pos_embed": torch.randn(1, (28 // patch) ** 2 + 1, width),
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
            f"{b}.mlp.w12.weight": torch.randn(2 * hidden, width),
            f"{b}.mlp.w12.bias": torch.randn(2 * hidden),
            f"{b}.mlp.w3.weight": torch.randn(width, hidden),
            f"{b}.mlp.w3.bias": torch.randn(width),
            f"{b}.ls2.gamma": torch.randn(width),
        })
    path = str(tmp_path / "dinov2_g.pth")
    torch.save(sd, path)

    params = weights_lib.load_dinov2(path, cfg)
    assert params["blocks"]["mlp"]["w12"]["w"].shape == (layers, width, 2 * hidden)
    out = dinov2_vit.dinov2_forward(params, jnp.zeros((1, 3, 28, 28)), cfg, jnp.float32)
    assert out["cls"].shape == (1, width)
    kvs = dinov2_vit.dinov2_kv(params, jnp.zeros((2, 3, 28, 28)), cfg, jnp.float32,
                               keep_layers=(0, 1))
    assert kvs["k"].shape == (2, 2, cfg.num_tokens, cfg.heads, cfg.head_dim)


def test_dinov2_family_architectures():
    """vit_small/base/large/giant2 entries match the reference family
    (dinov2/models/vision_transformer.py:314-366)."""
    fam = dinov2_vit.ARCHITECTURES
    assert (fam["ViT-S/14"].width, fam["ViT-S/14"].heads, fam["ViT-S/14"].layers) == (384, 6, 12)
    assert (fam["ViT-B/14"].width, fam["ViT-B/14"].heads, fam["ViT-B/14"].layers) == (768, 12, 12)
    assert (fam["ViT-L/14"].width, fam["ViT-L/14"].heads, fam["ViT-L/14"].layers) == (1024, 16, 24)
    g = fam["ViT-g/14"]
    assert (g.width, g.heads, g.layers, g.ffn_layer) == (1536, 24, 40, "swiglufused")
    # giant2's fused-SwiGLU hidden width: (4*1536 * 2/3) -> 4096
    assert g.swiglu_hidden == 4096


def test_framework_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6).reshape(2, 3).astype(np.float32),
            "nested": [{"b": np.ones((4,))}]}
    p = str(tmp_path / "state.pt")
    weights_lib.save_params(p, tree)
    loaded = weights_lib.load_params(p)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["nested"][0]["b"], tree["nested"][0]["b"])
