"""Model correctness tests.

Golden-value strategy (SURVEY.md §4): every kernel is checked against an
independent NumPy spec implementation of the reference math
(/root/reference/src/clip/model.py, /root/reference/src/models.py) rather
than against recorded torch activations (no checkpoints in this environment).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.models import clip_vit, decoder as decoder_lib
from dfd_clip_tpu.models.detector import Detector, auc_roc, kl_div, mse
from dfd_clip_tpu.ops.decoder_attention import dual_activation_attention

TINY = clip_vit.ViTConfig(
    input_resolution=32, patch_size=16, width=64, layers=3, heads=4, output_dim=32
)


# ---------- NumPy spec helpers (independent reimplementation of the math) -----

def np_layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def np_quick_gelu(x):
    return x / (1 + np.exp(-1.702 * x))


def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_clip_block(x, bp, heads):
    """Reference ResidualAttentionBlock math (src/clip/model.py:185-226)."""
    w = x.shape[-1]
    d = w // heads
    y = np_layer_norm(x, np.asarray(bp["ln_1"]["scale"]), np.asarray(bp["ln_1"]["bias"]))
    qkv = y @ np.asarray(bp["attn"]["in_proj"]["w"]) + np.asarray(bp["attn"]["in_proj"]["b"])
    q, k, v = np.split(qkv, 3, axis=-1)
    n, t, _ = q.shape
    q = q.reshape(n, t, heads, d)
    k = k.reshape(n, t, heads, d)
    v = v.reshape(n, t, heads, d)
    aff = np.einsum("nqhc,nkhc->nqkh", q / np.sqrt(d), k)
    aff = np_softmax(aff, axis=-2)
    mix = np.einsum("nqlh,nlhc->nqhc", aff, v).reshape(n, t, w)
    out = mix @ np.asarray(bp["attn"]["out_proj"]["w"]) + np.asarray(bp["attn"]["out_proj"]["b"])
    x = x + out
    y = np_layer_norm(x, np.asarray(bp["ln_2"]["scale"]), np.asarray(bp["ln_2"]["bias"]))
    y = y @ np.asarray(bp["mlp"]["c_fc"]["w"]) + np.asarray(bp["mlp"]["c_fc"]["b"])
    y = np_quick_gelu(y)
    y = y @ np.asarray(bp["mlp"]["c_proj"]["w"]) + np.asarray(bp["mlp"]["c_proj"]["b"])
    return x + y, k, v


def test_clip_kv_matches_numpy_spec(rng):
    params = clip_vit.init_clip_vision(jax.random.key(0), TINY)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    kvs = clip_vit.clip_vision_kv(params, jnp.asarray(x), TINY, jnp.float32)

    # NumPy spec: patch embed
    p = TINY.patch_size
    wconv = np.asarray(params["conv1"]["w"])  # (p, p, 3, width)
    n, g = 2, TINY.grid
    patches = x.reshape(n, 3, g, p, g, p).transpose(0, 2, 4, 3, 5, 1)  # n,gh,gw,ph,pw,c
    emb = patches.reshape(n, g * g, -1) @ wconv.transpose(3, 0, 1, 2).reshape(TINY.width, -1).T
    cls = np.broadcast_to(np.asarray(params["class_embedding"]), (n, 1, TINY.width))
    h = np.concatenate([cls, emb], axis=1) + np.asarray(params["positional_embedding"])
    h = np_layer_norm(h, np.asarray(params["ln_pre"]["scale"]), np.asarray(params["ln_pre"]["bias"]))

    for layer in range(TINY.layers):
        bp = jax.tree_util.tree_map(lambda a: a[layer], params["blocks"])
        h, k_ref, v_ref = np_clip_block(h, bp, TINY.heads)
        np.testing.assert_allclose(np.asarray(kvs["k"][layer]), k_ref, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(kvs["v"][layer]), v_ref, rtol=2e-4, atol=2e-4)


def test_patch_conv_equals_conv2d(rng):
    """HWIO lax conv with stride=patch equals the reference's Conv2d."""
    params = clip_vit.init_clip_vision(jax.random.key(1), TINY)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    out = clip_vit.embed_patches(params, jnp.asarray(x), TINY, jnp.float32)
    assert out.shape == (1, TINY.num_tokens, TINY.width)


# ---------- decoder attention --------------------------------------------------

def np_dual_attention(q_smax, q_coda, k, v, mask, num_frames, attn_mode=()):
    """Reference MultiheadAttention math (src/models.py:99-146)."""
    d = q_smax.shape[-1]
    scale = 1.0 / np.sqrt(d)
    m = mask[:, None, :, None]
    aff = np.einsum("bqhd,blhd->bqlh", q_smax * scale, k)
    aff = np.where(m, aff, -np.inf)
    if not attn_mode:
        smax = np_softmax(aff, axis=2)
    else:
        b, q, l, h = aff.shape
        fact = aff.reshape(b, q, num_frames, l // num_frames, h)
        parts = []
        if "frame" in attn_mode:
            parts.append(np_softmax(fact, axis=3))
        if "temporal" in attn_mode:
            parts.append(np_softmax(fact, axis=2))
        smax = sum(parts).reshape(b, q, l, h)
    # Divergence from the reference: fully-masked frames yield NaN rows in
    # torch's softmax; this framework defines them as zero contribution.
    smax = np.nan_to_num(smax, nan=0.0)
    coda_aff = np.tanh(np.einsum("bqhd,blhd->bqlh", q_coda * scale, k))
    l1 = np.abs(q_coda[:, :, None] - k[:, None, :]).sum(-1)
    gate = 2.0 / (1.0 + np.exp(l1 * scale))
    gate = np.where(m, gate, 0.0)
    aff = (smax + coda_aff * gate) / 2.0
    return np.einsum("bqlh,blhd->bqhd", aff, v)


@pytest.mark.parametrize("attn_mode", [(), ("frame",), ("temporal",), ("frame", "temporal")])
def test_dual_attention_matches_spec(rng, attn_mode):
    b, q, h, d, t, p = 2, 1, 4, 16, 5, 8
    l = t * p
    q_s = rng.standard_normal((b, q, h, d)).astype(np.float32)
    q_c = rng.standard_normal((b, q, h, d)).astype(np.float32)
    k = rng.standard_normal((b, l, h, d)).astype(np.float32)
    v = rng.standard_normal((b, l, h, d)).astype(np.float32)
    mask = np.ones((b, l), bool)
    mask[1, 3 * p :] = False  # last frames of sample 1 are padding

    got = dual_activation_attention(
        jnp.asarray(q_s), jnp.asarray(q_c), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mask), num_frames=t, attn_mode=attn_mode,
    )
    want = np_dual_attention(q_s, q_c, k, v, mask, t, attn_mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_masked_tokens_do_not_affect_output(rng):
    """Changing K/V at masked positions must not change the result."""
    b, h, d, t, p = 1, 2, 8, 4, 4
    l = t * p
    q_s = rng.standard_normal((b, 1, h, d)).astype(np.float32)
    q_c = rng.standard_normal((b, 1, h, d)).astype(np.float32)
    k = rng.standard_normal((b, l, h, d)).astype(np.float32)
    v = rng.standard_normal((b, l, h, d)).astype(np.float32)
    mask = np.ones((b, l), bool)
    mask[:, 2 * p :] = False

    out1 = dual_activation_attention(*map(jnp.asarray, (q_s, q_c, k, v, mask)), num_frames=t)
    k2, v2 = k.copy(), v.copy()
    k2[:, 2 * p :] += 100.0
    v2[:, 2 * p :] -= 50.0
    out2 = dual_activation_attention(*map(jnp.asarray, (q_s, q_c, k2, v2, mask)), num_frames=t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-6)


# ---------- decoder -------------------------------------------------------------

def _decoder_cfg(**kw):
    base = dict(
        width=TINY.width, heads=TINY.heads, num_frames=4,
        layer_indices=(0, 2), out_dims=(2,), dropout=0.0,
    )
    base.update(kw)
    return decoder_lib.DecoderConfig(**base)


def test_decoder_shapes(rng):
    cfg = _decoder_cfg()
    enc = clip_vit.init_clip_vision(jax.random.key(0), TINY)
    params = decoder_lib.init_decoder(jax.random.key(1), cfg, enc["blocks"])
    b, t, p = 3, 4, TINY.num_patches
    kvs = {
        "k": jnp.asarray(rng.standard_normal((2, b, t, p, TINY.heads, TINY.head_dim)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((2, b, t, p, TINY.heads, TINY.head_dim)), jnp.float32),
    }
    m = jnp.ones((b, t), bool)
    logits, feat = decoder_lib.apply_decoder(params, kvs, m, cfg)
    assert logits[0].shape == (b, 2)
    assert feat.shape == (b, TINY.width)


def test_decoder_block_init_from_encoder():
    """Decoder ln/mlp weights are copied from the kept encoder layers
    (reference src/models.py:178-229)."""
    cfg = _decoder_cfg(layer_indices=(0, 2))
    enc = clip_vit.init_clip_vision(jax.random.key(0), TINY)
    params = decoder_lib.init_decoder(jax.random.key(1), cfg, enc["blocks"])
    for i, layer in enumerate((0, 2)):
        np.testing.assert_array_equal(
            np.asarray(params["blocks"][i]["mlp"]["c_fc"]["w"]),
            np.asarray(enc["blocks"]["mlp"]["c_fc"]["w"][layer]),
        )
        np.testing.assert_array_equal(
            np.asarray(params["blocks"][i]["ln_1"]["scale"]),
            np.asarray(enc["blocks"]["ln_1"]["scale"][layer]),
        )


def test_decoder_global_prediction(rng):
    cfg = _decoder_cfg(global_prediction=True, aug_query=True)
    enc = clip_vit.init_clip_vision(jax.random.key(0), TINY)
    params = decoder_lib.init_decoder(jax.random.key(1), cfg, enc["blocks"])
    assert len(params["task_projections"][0]) == 2
    b, t, p = 2, 4, TINY.num_patches
    kvs = {
        "k": jnp.asarray(rng.standard_normal((2, b, t, p, TINY.heads, TINY.head_dim)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((2, b, t, p, TINY.heads, TINY.head_dim)), jnp.float32),
    }
    logits, feat = decoder_lib.apply_decoder(params, kvs, jnp.ones((b, t), bool), cfg)
    assert logits[0].shape == (b, 2)
    assert feat.shape == (b, 2, TINY.width)


# ---------- losses ---------------------------------------------------------------

def test_auc_roc_loss_matches_manual_ce(rng):
    logits = rng.standard_normal((4, 2)).astype(np.float32)
    y = np.array([0, 1, 1, 0])
    got = auc_roc()(jnp.asarray(logits), jnp.asarray(y))
    p = np_softmax(logits, axis=-1)
    want = -np.log(p[np.arange(4), y])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3)


def test_auc_roc_label_smoothing_and_weight(rng):
    logits = rng.standard_normal((4, 2)).astype(np.float32)
    y = np.array([0, 1, 1, 0])
    eps, w = 0.1, np.array([1.0, 2.0], np.float32)
    got = auc_roc(weight=w.tolist(), label_smoothing=eps)(jnp.asarray(logits), jnp.asarray(y))
    logp = np.log(np_softmax(logits, axis=-1))
    targets = np.eye(2)[y] * (1 - eps) + eps / 2
    want = -(w * targets * logp).sum(-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3)


def test_kl_div_loss(rng):
    logits = rng.standard_normal((3, 5)).astype(np.float32)
    y = np_softmax(rng.standard_normal((3, 5)).astype(np.float32), axis=-1)
    got = kl_div()(jnp.asarray(logits), jnp.asarray(y))
    log_q = np.log(np_softmax(logits, -1))
    want = y * (np.log(y) - log_q)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-5)


def test_mse_loss(rng):
    logits = rng.standard_normal((2, 140)).astype(np.float32)
    y = np.array([60.0, 90.0], np.float32)
    got = mse()(jnp.asarray(logits), jnp.asarray(y))
    expect = np_softmax(logits[:, :140], -1) @ np.arange(140)
    want = (expect - y) ** 2 / 1000.0
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


# ---------- detector end-to-end ---------------------------------------------------

def _tiny_detector(**model_overrides):
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "decode_mode": "index",
            "decode_indices": [0, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
            **model_overrides,
        }
    )
    det = Detector(cfg, num_frames=4, compute_dtype=jnp.float32)
    det.vit_cfg = TINY  # shrink the tower for tests
    det.transform = dataclasses.replace(det.transform, size=TINY.input_resolution)
    det.decoder_cfg = dataclasses.replace(
        det.decoder_cfg, width=TINY.width, heads=TINY.heads
    )
    if det.adapter_cfg is not None:
        det.adapter_cfg = dataclasses.replace(
            det.adapter_cfg, width=TINY.width, patches=TINY.num_patches,
            inner_dim=32,
        )
    return det


def test_detector_predict_and_logit_norm(rng):
    det = _tiny_detector()
    params = det.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8)
    m = np.ones((2, 4), bool)
    logits, _ = det.predict(params, jnp.asarray(x), jnp.asarray(m))
    norms = np.linalg.norm(np.asarray(logits[0]), axis=-1)
    np.testing.assert_allclose(norms, 5.0, rtol=1e-4)


def test_detector_forward_train_losses(rng):
    det = _tiny_detector()
    params = det.init_params(jax.random.key(0))
    b = 4
    x = rng.integers(0, 255, (b, 4, 3, 32, 32), dtype=np.uint8)
    m = np.ones((b, 4), bool)
    y = [jnp.asarray(np.array([0, 1, 0, 1]))]
    losses, logits, other = det.forward(
        params, jnp.asarray(x), y, jnp.asarray(m), train=True, single_task=0,
        rng=jax.random.key(1),
    )
    assert losses[0].shape == (b,)
    assert np.all(np.isfinite(np.asarray(losses[0])))
    assert other == {}


def test_detector_grads_flow_to_decoder_only(rng):
    det = _tiny_detector()
    params = det.init_params(jax.random.key(0))
    trainable, frozen = det.partition_params(params)
    assert "encoder" in frozen and "decoder" in trainable

    x = jnp.asarray(rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8))
    m = jnp.ones((2, 4), bool)
    y = [jnp.asarray(np.array([0, 1]))]

    def loss_fn(tr):
        p = {**frozen, **tr}
        losses, _, _ = det.forward(p, x, y, m, train=True, single_task=0)
        return losses[0].mean()

    grads = jax.grad(loss_fn)(trainable)
    gnorm = jax.tree_util.tree_reduce(
        lambda acc, g: acc + float(jnp.sum(jnp.abs(g))), grads, 0.0
    )
    assert gnorm > 0.0


def test_detector_ema_frame(rng):
    det = _tiny_detector(op_mode={"ema_frame": 0.9, "temporal_position": 1})
    params = det.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8)
    m = np.ones((2, 4), bool)
    losses, logits, other = det.forward(
        params, jnp.asarray(x), [jnp.asarray(np.array([0, 1]))], jnp.asarray(m),
        train=True, single_task=0,
    )
    assert np.all(np.isfinite(np.asarray(logits[0])))


def test_detector_temporal_ranking_loss(rng):
    det = _tiny_detector(train_mode={"temporal": "ranking"})
    params = det.init_params(jax.random.key(0))
    assert "ranking_proj" in params
    b = 4
    x = rng.integers(0, 255, (b, 4, 3, 32, 32), dtype=np.uint8)
    speed = jnp.asarray(np.array([1.0, 0.8, 0.6, 0.9], np.float32))
    losses, logits, other = det.forward(
        params, jnp.asarray(x), [jnp.asarray(np.array([0, 1, 0, 1]))],
        jnp.ones((b, 4), bool), speed=speed, train=True, single_task=0,
    )
    assert "speed/rank" in other
    assert np.isfinite(float(other["speed/rank"]))


def test_detector_patch_mask(rng):
    det = _tiny_detector(train_mode={"patch_mask": {"type": "sample", "ratio": 0.5}})
    params = det.init_params(jax.random.key(0))
    idx = det.sample_patch_indices(rng)
    assert idx.shape == (2, TINY.num_patches // 2)
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8)
    logits, _ = det.predict(
        params, jnp.asarray(x), jnp.ones((2, 4), bool),
        train=True, patch_indices=jnp.asarray(idx),
    )
    assert np.all(np.isfinite(np.asarray(logits[0])))


def test_detector_compression_feature_match(rng):
    det = _tiny_detector(train_mode={"compression": "feature-match"})
    params = det.init_params(jax.random.key(0))
    b = 4  # two raw/c23 pairs
    x = rng.integers(0, 255, (b, 4, 3, 32, 32), dtype=np.uint8)
    comp_is_raw = jnp.asarray(np.array([True, False, True, False]))
    losses, logits, other = det.forward(
        params, jnp.asarray(x), [jnp.asarray(np.array([0, 0, 1, 1]))],
        jnp.ones((b, 4), bool), comp_is_raw=comp_is_raw, train=True, single_task=0,
    )
    assert "match" in other and np.isfinite(float(other["match"]))


def test_selective_kv_matches_full(rng):
    """keep_layers scatter-in-scan equals full export + select (both towers)."""
    import numpy as np

    from dfd_clip_tpu.models import dinov2_vit

    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)
    params = clip_vit.init_clip_vision(jax.random.key(0), TINY)
    full = clip_vit.clip_vision_kv(params, x, TINY, jnp.float32)
    sel = clip_vit.clip_vision_kv(params, x, TINY, jnp.float32, keep_layers=(0, 2))
    for s in ("k", "v"):
        np.testing.assert_allclose(np.asarray(sel[s]), np.asarray(full[s])[[0, 2]],
                                   rtol=1e-5, atol=1e-5)

    dcfg = clip_vit.ViTConfig(input_resolution=28, patch_size=14, width=32,
                              layers=3, heads=2, output_dim=32)
    dparams = dinov2_vit.init_dinov2(jax.random.key(1), dcfg)
    xd = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    dfull = dinov2_vit.dinov2_kv(dparams, xd, dcfg, jnp.float32)
    dsel = dinov2_vit.dinov2_kv(dparams, xd, dcfg, jnp.float32, keep_layers=(1, 2))
    for s in ("k", "v"):
        np.testing.assert_allclose(np.asarray(dsel[s]), np.asarray(dfull[s])[[1, 2]],
                                   rtol=1e-5, atol=1e-5)


def test_farl_foundation_and_vit_l(rng):
    """FaRL foundation = CLIP tower; ViT-L registry entries construct."""
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg({
        "foundation": "farl", "architecture": "ViT-Test",
        "decode_mode": "stride", "decode_stride": 2,
        "out_dim": [2], "losses": ["auc_roc"],
    })
    det = Detector(cfg, num_frames=4, compute_dtype=jnp.float32)
    assert det.layer_indices == (0, 2)  # stride over the 3-layer test tower
    params = det.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (1, 4, 3, 32, 32), dtype=np.uint8)
    logits, _ = det.predict(params, jnp.asarray(x), jnp.ones((1, 4), bool))
    assert np.isfinite(np.asarray(logits[0])).all()

    # ViT-L configs resolve with stride layer selection over 24 layers
    lcfg = Detector.get_default_config()
    lcfg.merge_from_other_cfg({
        "architecture": "ViT-L/14", "decode_mode": "stride",
        "decode_stride": 4, "out_dim": [2], "losses": ["auc_roc"],
    })
    det_l = Detector(lcfg, num_frames=4)
    assert det_l.vit_cfg.layers == 24
    assert det_l.layer_indices == tuple(range(0, 24, 4))


def test_int8_kv_export_parity(rng):
    """op_mode.kv_dtype=int8 stores quantized K/V; logits stay close to the
    bf16 path (per-head absmax quantization)."""
    det_fp = _tiny_detector()
    det_q = _tiny_detector(op_mode={"temporal_position": 1, "kv_dtype": "int8"})
    params = det_fp.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8)
    m = jnp.ones((2, 4), bool)
    base, _ = det_fp.predict(params, jnp.asarray(x), m)
    quant, _ = det_q.predict(params, jnp.asarray(x), m)
    np.testing.assert_allclose(np.asarray(quant[0]), np.asarray(base[0]),
                               rtol=0.15, atol=0.3)
    # logits remain L2-norm 5
    np.testing.assert_allclose(np.linalg.norm(np.asarray(quant[0]), axis=-1),
                               5.0, rtol=1e-4)


def test_compute_int8_drift(rng):
    """op_mode.compute_int8 runs the encoder MLPs as W8A8 int8 GEMMs
    (PERF.md round-2 roofline: ~1.5x the bf16 MXU). Quantization drift on
    the exported K/V and final logits must stay small."""
    det_fp = _tiny_detector()
    det_q = _tiny_detector(op_mode={"temporal_position": 1, "compute_int8": 1})
    params = det_fp.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8)
    m = jnp.ones((2, 4), bool)

    kv_fp = det_fp.encode_kv(params, det_fp.preprocess(jnp.asarray(x)))
    kv_q = det_q.encode_kv(params, det_q.preprocess(jnp.asarray(x)))
    for s in ("k", "v"):
        a = np.asarray(kv_fp[s], np.float32).ravel()
        b = np.asarray(kv_q[s], np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.995, f"{s} cosine {cos}"

    base, _ = det_fp.predict(params, jnp.asarray(x), m)
    quant, _ = det_q.predict(params, jnp.asarray(x), m)
    np.testing.assert_allclose(np.asarray(quant[0]), np.asarray(base[0]),
                               rtol=0.15, atol=0.3)


def test_adapter_grads_flow_on_pallas_train_path(rng, monkeypatch):
    """A Detector with a trainable adapter must receive adapter gradients
    through the decoder's K/V inputs on the Pallas training path (the
    custom-VJP route, ops/decoder_attention_vjp.py) — and they must match
    the XLA composition's autodiff. Regression: an earlier VJP returned
    structural-zero dK/dV, which trained the decoder but silently froze
    the adapter on TPU."""
    det = _tiny_detector(adapter={"type": "scratch",
                                  "struct": {"type": "768-x-768", "x": 32}})
    params = det.init_params(jax.random.key(0))
    assert "adapter" in params

    x = jnp.asarray(rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8))
    m = jnp.ones((2, 4), bool)
    y = [jnp.asarray(np.array([0, 1]))]

    def adapter_grads(p):
        def loss_fn(ad):
            losses, _, _ = det.forward({**p, "adapter": ad}, x, y, m,
                                       train=True, single_task=0)
            return losses[0].mean()

        return jax.grad(loss_fn)(p["adapter"])

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")  # interpret on CPU
    got = adapter_grads(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda acc, g: acc + float(jnp.sum(jnp.abs(g))), got, 0.0
    )
    assert gnorm > 0.0, "adapter grads are zero on the Pallas train path"

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = adapter_grads(params)
    jax.tree_util.tree_map(
        lambda g, w: np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5),
        got, want,
    )


def test_feature_match_global_prediction_per_block_softmax(rng):
    """Under global_prediction, video_features is (B, num_blocks, W): the
    feature-match KL must softmax each block over W separately (reference
    src/models.py:627-632), not over a flattened (num_blocks*W,) vector.
    Verified against a direct NumPy computation of the reference formula."""
    det = _tiny_detector(train_mode={"compression": "feature-match"},
                         op_mode={"global_prediction": 1,
                                  "temporal_position": 1})
    params = det.init_params(jax.random.key(0))
    b = 4
    x = rng.integers(0, 255, (b, 4, 3, 32, 32), dtype=np.uint8)
    comp_is_raw = jnp.asarray(np.array([True, False, False, True]))
    _, _, other = det.forward(
        params, jnp.asarray(x), [jnp.asarray(np.array([0, 0, 1, 1]))],
        jnp.ones((b, 4), bool), comp_is_raw=comp_is_raw, train=True,
        single_task=0,
    )

    _, feats = det.predict(params, jnp.asarray(x), jnp.ones((b, 4), bool),
                           with_video_features=True)
    vf = np.asarray(feats["video"], np.float64)  # (B, num_blocks, W)
    assert vf.ndim == 3 and vf.shape[1] > 1

    def log_softmax(a):
        a = a - a.max(-1, keepdims=True)
        return a - np.log(np.exp(a).sum(-1, keepdims=True))

    w_pairs = b // 2
    total = 0.0
    for pair in range(w_pairs):
        i0, i1 = 2 * pair, 2 * pair + 1
        raw_i, c23_i = (i0, i1) if bool(comp_is_raw[i0]) else (i1, i0)
        log_p = log_softmax(vf[raw_i])
        log_q = log_softmax(vf[c23_i])
        kl = np.exp(log_p) * (log_p - log_q)
        total += kl.mean() / w_pairs  # torch kl_div reduction='mean'
    expected = 100.0 * total
    np.testing.assert_allclose(float(other["match"]), expected,
                               rtol=1e-3, atol=1e-5)
