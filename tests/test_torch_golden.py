"""Golden parity tests against the reference's ACTUAL torch modules.

Unlike test_models.py (NumPy specs written alongside the JAX port, which
could share a misreading with it), these tests import the reference's own
torch code (src/clip/model.py, src/models.py) via utils.refload, load the
SAME weights into both sides through the weights.py converters, and assert
the outputs agree to fp32 tolerance. A misreading of the reference on either
side fails here.

Covers: encoder K/V export (full + keep-layers scatter path), the
dual-activation decoder across every op_mode family, the Detector.predict
glue (CLS drop, layer select, L2-norm x5), and the loss factories.

Skipped when /root/reference (or torch) is unavailable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfd_clip_tpu.utils.refload import load_reference
from dfd_clip_tpu.models import clip_vit, decoder as decoder_lib, detector as detector_lib
from dfd_clip_tpu.models import weights as weights_lib
from dfd_clip_tpu.config import CfgNode

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference tree or torch unavailable")

if ref is not None:
    import torch

# Tiny geometry shared by all tests: 32x32 input, 16px patches -> 4 patches
# (5 tokens), width 64, 4 heads, 3 layers == our "ViT-Test" architecture.
RES, PATCH, WIDTH, LAYERS, HEADS, OUT = 32, 16, 64, 3, 4, 32
B, T = 2, 3  # clips x frames
PATCHES = (RES // PATCH) ** 2


def _randomize(module, seed: int):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))
    module.eval()
    return module


def _torch_vit(seed: int = 0):
    vt = ref.clip_model.VisionTransformer(
        input_resolution=RES, patch_size=PATCH, width=WIDTH,
        layers=LAYERS, heads=HEADS, output_dim=OUT,
    )
    return _randomize(vt, seed)


def _our_encoder_params(vt):
    sd = {k: v.detach().numpy() for k, v in vt.state_dict().items()}
    # infer_clip_vit_config derives heads from the real-CLIP head_dim=64
    # invariant, which the 16-dim-head test tower breaks; check the inferable
    # fields and take the full config from the architecture table.
    inferred = weights_lib.infer_clip_vit_config(sd)
    assert (inferred.width, inferred.layers) == (WIDTH, LAYERS)
    cfg = clip_vit.ARCHITECTURES["ViT-Test"]
    return weights_lib.convert_clip_visual(sd, cfg), cfg


def _frames(n, seed=1):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, 3, RES, RES)).astype(np.float32)


# -- encoder ------------------------------------------------------------------

def test_encoder_kv_export_matches_reference():
    vt = _torch_vit()
    params, cfg = _our_encoder_params(vt)
    x = _frames(B * T)

    with torch.no_grad():
        ref_kvs = vt(torch.from_numpy(x))  # list of {k, v}: (N, T_tok, H, D)

    ours = jax.jit(
        lambda p, x: clip_vit.clip_vision_kv(p, x, cfg, compute_dtype=jnp.float32)
    )(params, jnp.asarray(x))

    assert ours["k"].shape == (LAYERS, B * T, PATCHES + 1, HEADS, WIDTH // HEADS)
    for i in range(LAYERS):
        np.testing.assert_allclose(
            np.asarray(ours["k"][i]), ref_kvs[i]["k"].numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours["v"][i]), ref_kvs[i]["v"].numpy(), atol=1e-4, rtol=1e-4
        )


def test_encoder_keep_layers_matches_reference():
    """The scatter-in-scan selective export returns the same K/V."""
    vt = _torch_vit(seed=2)
    params, cfg = _our_encoder_params(vt)
    x = _frames(B * T, seed=3)
    keep = (0, 2)

    with torch.no_grad():
        ref_kvs = vt(torch.from_numpy(x))

    ours = jax.jit(
        lambda p, x: clip_vit.clip_vision_kv(
            p, x, cfg, compute_dtype=jnp.float32, keep_layers=keep
        )
    )(params, jnp.asarray(x))

    for slot, layer in enumerate(keep):
        np.testing.assert_allclose(
            np.asarray(ours["k"][slot]), ref_kvs[layer]["k"].numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(ours["v"][slot]), ref_kvs[layer]["v"].numpy(), atol=1e-4, rtol=1e-4
        )


# -- decoder ------------------------------------------------------------------

def _ref_decoder(op_mode: dict, out_dims, concat_ref=False, seed=10, encoder=None):
    encoder = encoder or _torch_vit(seed=seed + 1)
    det = ref.models.Object()
    det.encoder = encoder
    det.layer_indices = [0, 2]
    cfg = CfgNode(
        {
            "out_dim": list(out_dims),
            "op_mode": dict(op_mode),
            "dropout": 0.0,
            "foundation": "clip",
            "concat_ref": bool(concat_ref),
        }
    )
    dec = ref.models.Decoder(det, cfg, num_frames=T)
    return _randomize(dec, seed), det


def _our_decoder_cfg(op_mode: dict, out_dims, concat_ref=False):
    return decoder_lib.DecoderConfig(
        width=WIDTH,
        heads=HEADS,
        num_frames=T,
        layer_indices=(0, 2),
        out_dims=tuple(out_dims),
        dropout=0.0,
        temporal_position=bool(op_mode.get("temporal_position", 0)),
        attn_mode=tuple(op_mode["attn_mode"].split("+")) if "attn_mode" in op_mode else (),
        aug_query=bool(op_mode.get("aug_query", 0)),
        global_prediction=bool(op_mode.get("global_prediction", 0)),
        concat_ref=bool(concat_ref),
    )


def _rand_kvs(seed=4):
    rng = np.random.default_rng(seed)
    shape = (2, B, T, PATCHES, HEADS, WIDTH // HEADS)
    return (
        rng.normal(size=shape).astype(np.float32),
        rng.normal(size=shape).astype(np.float32),
    )


OP_MODES = [
    ({"temporal_position": 1}, [2], False, "masked"),
    ({"temporal_position": 0}, [2], False, "masked"),
    ({"temporal_position": 1, "attn_mode": "frame"}, [2], False, "full"),
    ({"temporal_position": 1, "attn_mode": "temporal"}, [2], False, "masked"),
    ({"temporal_position": 1, "attn_mode": "frame+temporal"}, [2], False, "full"),
    ({"temporal_position": 1, "global_prediction": 1}, [2, 180], False, "masked"),
    ({"temporal_position": 1, "aug_query": 1}, [2], False, "masked"),
    ({"temporal_position": 1}, [2, 3], True, "masked"),
]


@pytest.mark.parametrize("op_mode,out_dims,concat_ref,mask_kind", OP_MODES)
def test_decoder_matches_reference(op_mode, out_dims, concat_ref, mask_kind):
    dec, _ = _ref_decoder(op_mode, out_dims, concat_ref)
    k, v = _rand_kvs()
    # full-true mask for "frame"-factorized softmax: a fully-masked frame is
    # a softmax over an all -inf row, NaN in torch (never occurs in training
    # because attn_mode datasets use pack sampling with full windows).
    m = np.ones((B, T), bool)
    if mask_kind == "masked":
        m[1, -1] = False

    ref_kvs = [
        {"k": torch.from_numpy(k[i]).clone(), "v": torch.from_numpy(v[i]).clone()}
        for i in range(2)
    ]
    with torch.no_grad():
        ref_logits, ref_feat = dec(ref_kvs, torch.from_numpy(m))

    cfg = _our_decoder_cfg(op_mode, out_dims, concat_ref)
    sd = {kk: vv.detach().numpy() for kk, vv in dec.state_dict().items()}
    params = weights_lib.convert_reference_decoder(sd, cfg)
    ours_logits, ours_feat = jax.jit(
        lambda p, kvs, m: decoder_lib.apply_decoder(p, kvs, m, cfg)
    )(params, {"k": jnp.asarray(k), "v": jnp.asarray(v)}, jnp.asarray(m))

    for a, b in zip(ours_logits, ref_logits):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours_feat).reshape(ref_feat.shape), ref_feat.numpy(),
        atol=1e-4, rtol=1e-4,
    )


# -- detector predict glue ------------------------------------------------------

def test_detector_predict_matches_reference():
    """encoder -> CLS drop -> layer select -> decoder -> L2-norm x5
    (src/models.py:498-566), end-to-end on shared weights."""
    vt = _torch_vit(seed=20)
    enc_params, _ = _our_encoder_params(vt)
    dec, det = _ref_decoder({"temporal_position": 1}, [2, 180], seed=21, encoder=vt)

    x = _frames(B * T, seed=22).reshape(B, T, 3, RES, RES)
    m = np.ones((B, T), bool)
    m[0, -1] = False

    # Reference predict glue (torch side).
    with torch.no_grad():
        kvs_all = vt(torch.from_numpy(x.reshape(B * T, 3, RES, RES)))
        ref_kvs = [
            {kk: vv[:, 1:].unflatten(0, (B, T)) for kk, vv in kvs_all[i].items()}
            for i in det.layer_indices
        ]
        ref_logits, _ = dec(ref_kvs, torch.from_numpy(m))
        ref_logits = [
            5 * t / (torch.norm(t, dim=-1, keepdim=True) + 1e-10) for t in ref_logits
        ]

    config = detector_lib.Detector.get_default_config()
    config.architecture = "ViT-Test"
    config.out_dim = [2, 180]
    config.losses = ["auc_roc", "kl_div"]
    det_ours = detector_lib.Detector(config, num_frames=T, compute_dtype=jnp.float32)
    assert det_ours.layer_indices == (0, 2)
    params = {
        "encoder": enc_params,
        "decoder": weights_lib.convert_reference_decoder(
            {kk: vv.detach().numpy() for kk, vv in dec.state_dict().items()},
            det_ours.decoder_cfg,
        ),
    }
    ours_logits, _ = jax.jit(
        lambda p, x, m: det_ours.predict(p, x, m)
    )(params, jnp.asarray(x), jnp.asarray(m))

    for a, b in zip(ours_logits, ref_logits):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=1e-4, rtol=1e-4)


# -- dinov2 SwiGLU FFN ------------------------------------------------------------

def test_swiglu_ffn_matches_reference():
    """apply_ffn swiglufused vs dinov2/layers/swiglu_ffn.py SwiGLUFFNFused,
    including the 2/3-of-4w hidden rounding."""
    from dfd_clip_tpu.utils.refload import load_reference_module
    from dfd_clip_tpu.models import dinov2_vit

    swiglu_mod = load_reference_module("dinov2/layers/swiglu_ffn.py")
    if swiglu_mod is None:
        pytest.skip("reference dinov2 tree unavailable")

    w = 32
    ffn = swiglu_mod.SwiGLUFFNFused(in_features=w, hidden_features=4 * w)
    _randomize(ffn, seed=30)
    cfg = dinov2_vit.ARCHITECTURES["ViT-Test-SwiGLU"]
    assert ffn.w12.weight.shape[0] == 2 * cfg.swiglu_hidden

    params = {
        "w12": {
            "w": jnp.asarray(ffn.w12.weight.detach().numpy().T),
            "b": jnp.asarray(ffn.w12.bias.detach().numpy()),
        },
        "w3": {
            "w": jnp.asarray(ffn.w3.weight.detach().numpy().T),
            "b": jnp.asarray(ffn.w3.bias.detach().numpy()),
        },
    }
    x = np.random.default_rng(31).normal(size=(6, w)).astype(np.float32)
    with torch.no_grad():
        expect = ffn(torch.from_numpy(x)).numpy()
    got = np.asarray(dinov2_vit.apply_ffn(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, expect, atol=1e-5, rtol=1e-5)


# -- loss factories ---------------------------------------------------------------

def test_loss_factories_match_reference():
    rng = np.random.default_rng(7)
    logits140 = rng.normal(size=(8, 180)).astype(np.float32)
    bpm = rng.uniform(40, 140, size=(8,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(detector_lib.mse()(jnp.asarray(logits140), jnp.asarray(bpm))),
        ref.models.mse(torch.from_numpy(logits140), torch.from_numpy(bpm)).numpy(),
        atol=1e-5, rtol=1e-5,
    )

    logits = rng.normal(size=(8, 6)).astype(np.float32)
    p = rng.uniform(0.01, 1, size=(8, 6)).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(detector_lib.kl_div()(jnp.asarray(logits), jnp.asarray(p))),
        ref.models.kl_div()(torch.from_numpy(logits), torch.from_numpy(p)).numpy(),
        atol=1e-5, rtol=1e-5,
    )

    y = rng.integers(0, 6, size=(8,))
    for kwargs in ({}, {"weight": [1.0, 2.0, 1.0, 1.0, 3.0, 1.0]}, {"label_smoothing": 0.1}):
        ours = detector_lib.auc_roc(**kwargs)(jnp.asarray(logits), jnp.asarray(y))
        theirs = ref.models.auc_roc(**kwargs)(
            torch.from_numpy(logits), torch.from_numpy(y)
        )
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5)
