"""CLIP ModifiedResNet tower: shape checks + torch-golden parity vs the
reference's own module (src/clip/model.py:10-155)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfd_clip_tpu.models import clip_resnet, weights as weights_lib
from dfd_clip_tpu.utils.refload import load_reference

ref = load_reference()


def test_init_and_forward_shapes():
    cfg = clip_resnet.ARCHITECTURES["RN-Test"]
    params = clip_resnet.init_clip_resnet(jax.random.key(0), cfg)
    x = jnp.zeros((2, 3, cfg.input_resolution, cfg.input_resolution), jnp.float32)
    out = clip_resnet.clip_resnet_features(params, x, cfg,
                                           compute_dtype=jnp.float32)
    assert out.shape == (2, cfg.output_dim)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.skipif(ref is None, reason="reference tree or torch unavailable")
def test_resnet_torch_golden():
    import torch

    cfg = clip_resnet.ARCHITECTURES["RN-Test"]
    model = ref.clip_model.ModifiedResNet(
        layers=list(cfg.layers), output_dim=cfg.output_dim, heads=cfg.heads,
        input_resolution=cfg.input_resolution, width=cfg.width,
    )
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(0.1 * torch.randn(p.shape, generator=g))
        # non-trivial BatchNorm running stats — the inference-BN path must
        # use them, not the (zero, one) defaults
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(0.05 * torch.randn(m.running_mean.shape,
                                                        generator=g))
                m.running_var.copy_(
                    (0.5 + torch.rand(m.running_var.shape, generator=g)))
    model = model.float().eval()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert weights_lib.infer_clip_resnet_config(sd) == cfg
    params = weights_lib.convert_clip_resnet(sd)

    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(2, 3, cfg.input_resolution,
                            cfg.input_resolution)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(imgs)).numpy()
    got = np.asarray(clip_resnet.clip_resnet_features(
        params, jnp.asarray(imgs), cfg, compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
