"""Pallas kernels vs their XLA specs (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.ops.attention import _xla_attention
from dfd_clip_tpu.ops.decoder_attention import dual_activation_attention
from dfd_clip_tpu.ops.pallas_attention import fused_encoder_attention
from dfd_clip_tpu.ops.pallas_decoder_attention import fused_decoder_attention


def test_fused_encoder_attention_matches_xla(rng):
    n, t, h, d = 3, 197, 4, 64
    q = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.float32)
    got = fused_encoder_attention(q, k, v)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_encoder_attention_qkv_matches_xla(rng):
    from dfd_clip_tpu.ops.pallas_attention import fused_encoder_attention_qkv

    n, t, h, d = 4, 197, 4, 64
    qkv = jnp.asarray(rng.standard_normal((n, t, 3 * h * d)), jnp.float32)
    got = fused_encoder_attention_qkv(qkv, h, d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = _xla_attention(
        q.reshape(n, t, h, d), k.reshape(n, t, h, d), v.reshape(n, t, h, d)
    ).reshape(n, t, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["export", "plain", "last_only"])
def test_fused_attn_block_matches_xla_composition(rng, mode):
    """LN1 + qkv GEMM + attention + out-proj + residual in one kernel."""
    from dfd_clip_tpu.models import layers
    from dfd_clip_tpu.ops.attention import encoder_self_attention_qkv
    from dfd_clip_tpu.ops.pallas_attention import fused_encoder_attn_block

    n, t, h, d = 4, 197, 4, 64
    w = h * d
    hin = jnp.asarray(rng.standard_normal((n, t, w)), jnp.float32)
    keys = jax.random.split(jax.random.key(0), 2)
    ln = layers.init_layer_norm(w)
    ln = {"scale": ln["scale"] + 0.3, "bias": ln["bias"] - 0.1}
    attn = {
        "in_proj": layers.init_linear(keys[0], w, 3 * w),
        "out_proj": layers.init_linear(keys[1], w, w),
    }

    y = layers.layer_norm(ln, hin)
    qkv = layers.linear(attn["in_proj"], y)
    k_want = qkv[:, 1:, w : 2 * w].reshape(n, t - 1, h, d)
    v_want = qkv[:, 1:, 2 * w :].reshape(n, t - 1, h, d)
    h_want = hin + layers.linear(
        attn["out_proj"], encoder_self_attention_qkv(qkv, h, d)
    )

    if mode == "export":
        ho, k, v = fused_encoder_attn_block(
            hin, ln, attn, h, d, export=True, drop_cls=True
        )
    elif mode == "plain":
        ho = fused_encoder_attn_block(hin, ln, attn, h, d)
        k = v = None
    else:
        k, v = fused_encoder_attn_block(
            hin, ln, attn, h, d, drop_cls=True, last_only=True
        )
        ho = None

    if ho is not None:
        np.testing.assert_allclose(
            np.asarray(ho), np.asarray(h_want), rtol=2e-4, atol=2e-4
        )
    if k is not None:
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(k_want), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(v_want), rtol=2e-4, atol=2e-4
        )


def test_fused_mlp_block_matches_xla_composition(rng):
    from dfd_clip_tpu.models import layers
    from dfd_clip_tpu.ops.pallas_attention import fused_encoder_mlp_block

    n, t, w = 4, 197, 256
    hin = jnp.asarray(rng.standard_normal((n, t, w)), jnp.float32)
    keys = jax.random.split(jax.random.key(1), 2)
    ln = layers.init_layer_norm(w)
    ln = {"scale": ln["scale"] * 1.1, "bias": ln["bias"] + 0.05}
    mlp = {
        "c_fc": layers.init_linear(keys[0], w, 4 * w),
        "c_proj": layers.init_linear(keys[1], 4 * w, w),
    }
    want = hin + layers.linear(
        mlp["c_proj"], layers.quick_gelu(
            layers.linear(mlp["c_fc"], layers.layer_norm(ln, hin)))
    )
    got = fused_encoder_mlp_block(hin, ln, mlp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_decoder_attention_matches_xla(rng):
    b, h, d, t, p = 2, 4, 64, 5, 8
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[1, 3 * p :] = False

    got = fused_decoder_attention(qs, qc, k, v, jnp.asarray(mask))
    want = dual_activation_attention(qs, qc, k, v, jnp.asarray(mask), num_frames=t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_decoder_attention_large_logits(rng):
    """Decoder queries are TRAINED, so attention logits are not structurally
    bounded: the kernel's softmax must stay exact (online max) where a fixed
    exp clamp would silently diverge from the XLA/training path (ADVICE r2).
    Scaled queries push logits to ~±180 here."""
    b, h, d, t, p = 2, 4, 64, 5, 8
    l = t * p
    qs = jnp.asarray(30.0 * rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(30.0 * rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    pos = jnp.asarray(0.1 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[1, 3 * p :] = False

    got = fused_decoder_attention(qs, qc, k, v, jnp.asarray(mask),
                                  temporal_pos=pos)
    want = dual_activation_attention(qs, qc, k, v, jnp.asarray(mask),
                                     num_frames=t, temporal_pos=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("drop_cls", [False, True])
@pytest.mark.parametrize("stacked", ["1", "0"])
def test_clip_vision_kv_pallas_matches_xla(rng, monkeypatch, drop_cls, stacked):
    """The production single-device TPU path (fused blocks + stacked in-place
    K/V export) vs the XLA composition, in interpreter mode on CPU — covers
    drop_cls x DFD_STACKED_EXPORT (ADVICE r2: this path previously had no CI
    coverage)."""
    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES, clip_vision_kv, init_clip_vision

    cfg = ARCHITECTURES["ViT-Test"]
    params = init_clip_vision(jax.random.key(3), cfg)
    x = jnp.asarray(
        rng.standard_normal((2, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    keep = (0, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=drop_cls)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_STACKED_EXPORT", stacked)
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=drop_cls)

    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=5e-4, atol=5e-4
        )


def test_clip_vision_kv_fresh_acc_matches_zeroed(rng, monkeypatch):
    """DFD_FRESH_ACC=1 (first export call emits the stacked accumulators as
    fresh outputs, no zero-init pass) == the zero-initialized form."""
    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES, clip_vision_kv, init_clip_vision

    cfg = ARCHITECTURES["ViT-Test"]
    params = init_clip_vision(jax.random.key(3), cfg)
    x = jnp.asarray(
        rng.standard_normal((2, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_STACKED_EXPORT", "1")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=(0, 2), drop_cls=True)
    monkeypatch.setenv("DFD_FRESH_ACC", "1")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=(0, 2), drop_cls=True)
    for name in ("k", "v"):
        np.testing.assert_allclose(np.asarray(got[name]), np.asarray(want[name]),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("stacked", ["1", "0"])
@pytest.mark.parametrize("int8", [False, True])
def test_clip_vision_kv_full_block_matches_xla(rng, monkeypatch, stacked, int8):
    """Whole-block fusion (DFD_FUSED_BLOCK=full: attention + MLP + export in
    ONE kernel per layer) vs the XLA composition, interpret mode on CPU."""
    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES, clip_vision_kv, init_clip_vision

    cfg = ARCHITECTURES["ViT-Test"]
    params = init_clip_vision(jax.random.key(3), cfg)
    x = jnp.asarray(
        rng.standard_normal((2, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    keep = (0, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True,
                          compute_int8=int8)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_FUSED_BLOCK", "full")
    monkeypatch.setenv("DFD_STACKED_EXPORT", stacked)
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True,
                         compute_int8=int8)

    # int8 per-row activation quantization differs slightly between the
    # fused (in-VMEM rows) and XLA (linear_w8a8) compositions.
    tol = 5e-2 if int8 else 5e-4
    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=tol, atol=tol
        )


@pytest.mark.parametrize("phase", ["full", "mlp", "attn", "rows", "fr",
                                   "frm"])
def test_clip_vision_kv_phase_major_matches_xla(rng, monkeypatch, phase):
    """DFD_PHASE_MAJOR variants of the whole-block kernel (stage-interleaved
    program order for Mosaic ILP — see _make_full_block_kernel_phased) must
    be numerically identical to the XLA composition; only scheduling
    differs."""
    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES, clip_vision_kv, init_clip_vision

    cfg = ARCHITECTURES["ViT-Test"]
    params = init_clip_vision(jax.random.key(3), cfg)
    x = jnp.asarray(
        rng.standard_normal((2, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    keep = (0, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True, compute_int8=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_FUSED_BLOCK", "full")
    monkeypatch.setenv("DFD_PHASE_MAJOR", phase)
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True, compute_int8=True)

    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=5e-2, atol=5e-2
        )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_clip_vision_kv_int8_rows_export(rng, monkeypatch, backend):
    """kv_int8_rows: per-row int8 K/V export (kernel-quantized on the Pallas
    path, XLA composition otherwise). Dequantized K/V must match the bf16
    export within row-wise int8 tolerance (~0.8% relative)."""
    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES, clip_vision_kv, init_clip_vision

    cfg = ARCHITECTURES["ViT-Test"]
    params = init_clip_vision(jax.random.key(3), cfg)
    x = jnp.asarray(
        rng.standard_normal((2, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    keep = (0, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", backend)
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True, kv_int8_rows=True)
    assert got["k"].dtype == jnp.int8
    assert got["k_scale"].shape == got["k"].shape[:3] + (1,)
    for name in ("k", "v"):
        deq = (got[name].astype(jnp.float32)
               * got[f"{name}_scale"][..., None])
        ref = np.asarray(want[name], np.float32)
        denom = np.abs(ref).max() + 1e-9
        np.testing.assert_allclose(np.asarray(deq) / denom, ref / denom,
                                   atol=2e-2)


def test_detector_predict_int8_rows_close(rng, monkeypatch):
    """End-to-end: op_mode.kv_dtype="int8_rows" predict stays close to the
    bf16 K/V baseline on both decoder backends (kernel dequant vs XLA
    dequant)."""
    from dfd_clip_tpu.models.detector import Detector

    def build(kv_dtype, backend):
        monkeypatch.setenv("DFD_ATTENTION_BACKEND", backend)
        cfg = Detector.get_default_config()
        cfg.merge_from_other_cfg({
            "architecture": "ViT-Test", "decode_mode": "index",
            "decode_indices": [0, 2], "out_dim": [2], "losses": ["auc_roc"],
            "op_mode": {"temporal_position": 1, "kv_dtype": kv_dtype}})
        return Detector(cfg, num_frames=4)

    x = rng.integers(0, 255, (2, 4, 3, 32, 32)).astype(np.uint8)
    m = np.ones((2, 4), bool)
    ref = build("auto", "xla")
    params = ref.init_params(jax.random.key(0))
    base = np.asarray(ref.predict(params, x, m)[0][0])
    for backend in ("xla", "pallas"):
        out = np.asarray(build("int8_rows", backend).predict(params, x, m)[0][0])
        cos = float(np.sum(out * base)
                    / (np.linalg.norm(out) * np.linalg.norm(base) + 1e-9))
        assert cos > 0.999, (backend, cos)


def test_clip_vision_kv_wide_tower_int8_fused(rng, monkeypatch):
    """w=1024 towers (ViT-L class) keep the fused blocks on the int8 path —
    int8 weights fit scoped VMEM where bf16 doesn't (clip_vit gate)."""
    from dfd_clip_tpu.models.clip_vit import ViTConfig, clip_vision_kv, init_clip_vision

    cfg = ViTConfig(input_resolution=32, patch_size=16, width=1024,
                    layers=2, heads=16, output_dim=32)
    params = init_clip_vision(jax.random.key(5), cfg)
    x = jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=(0, 1), drop_cls=True, compute_int8=True)
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=(0, 1), drop_cls=True, compute_int8=True)
    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=5e-2, atol=5e-2
        )


def test_decoder_dispatcher_env_switch(rng, monkeypatch):
    b, h, d, l = 2, 2, 32, 16
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    mask = jnp.ones((b, l), bool)
    base = dual_activation_attention(qs, qc, k, v, mask, num_frames=4)
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    via_pallas = dual_activation_attention(qs, qc, k, v, mask, num_frames=4)
    np.testing.assert_allclose(np.asarray(base), np.asarray(via_pallas), rtol=2e-4, atol=2e-5)


def test_fused_kernels_int8_gemm_close_to_bf16(rng):
    """op_mode.compute_int8 in-kernel W8A8: the fused attn/MLP kernels with
    int8 GEMMs stay close to their bf16 selves (dynamic per-row activation
    scales x per-channel weight scales)."""
    from dfd_clip_tpu.models import layers
    from dfd_clip_tpu.ops.pallas_attention import (
        fused_encoder_attn_block,
        fused_encoder_mlp_block,
    )

    n, t, h, d = 4, 197, 4, 64
    w = h * d
    hin = jnp.asarray(0.5 * rng.standard_normal((n, t, w)), jnp.float32)
    keys = jax.random.split(jax.random.key(2), 4)
    ln = layers.init_layer_norm(w)
    attn = {
        "in_proj": layers.init_linear(keys[0], w, 3 * w),
        "out_proj": layers.init_linear(keys[1], w, w),
    }
    mlp = {
        "c_fc": layers.init_linear(keys[2], w, 4 * w),
        "c_proj": layers.init_linear(keys[3], 4 * w, w),
    }

    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)

    ho, k, v = fused_encoder_attn_block(hin, ln, attn, h, d,
                                        export=True, drop_cls=True)
    ho8, k8, v8 = fused_encoder_attn_block(hin, ln, attn, h, d,
                                           export=True, drop_cls=True,
                                           int8_gemm=True)
    assert cos(ho, ho8) > 0.999
    assert cos(k, k8) > 0.995
    assert cos(v, v8) > 0.995

    mo = fused_encoder_mlp_block(hin, ln, mlp)
    mo8 = fused_encoder_mlp_block(hin, ln, mlp, int8_gemm=True)
    assert cos(mo, mo8) > 0.999


@pytest.mark.parametrize("global_pred", [False, True])
def test_decoder_stack_boundary_matches_xla(rng, monkeypatch, global_pred):
    """DFD_DEC_STACK=force (per-block boundary kernels + attention kernel,
    zero XLA interstitial) vs the plain XLA decoder composition."""
    from dfd_clip_tpu.models import decoder as decoder_lib
    from dfd_clip_tpu.models.decoder import DecoderConfig, init_decoder

    cfg = DecoderConfig(width=128, heads=2, num_frames=3,
                        layer_indices=(0, 1), out_dims=(2,),
                        global_prediction=global_pred)
    params = init_decoder(jax.random.key(0), cfg)
    kvs = {
        s: jnp.asarray(rng.standard_normal((2, 2, 3, 8, 2, 64)), jnp.float32)
        for s in ("k", "v")
    }
    m = jnp.asarray([[True, True, True], [True, True, False]])

    monkeypatch.setenv("DFD_DEC_STACK", "0")
    want_logits, want_feat = decoder_lib.apply_decoder(params, kvs, m, cfg)

    monkeypatch.setenv("DFD_DEC_STACK", "force")
    got_logits, got_feat = decoder_lib.apply_decoder(params, kvs, m, cfg)

    np.testing.assert_allclose(np.asarray(got_feat), np.asarray(want_feat),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_logits[0]),
                               np.asarray(want_logits[0]),
                               rtol=2e-3, atol=2e-4)


def test_decoder_training_grad_skips_kernel(rng, monkeypatch):
    """Training differentiates through the decoder; with the pallas backend
    forced the train=True path must be differentiable end-to-end (it routes
    through the custom-VJP wrapper — or XLA with DFD_DEC_VJP=0), while
    train=False runs the kernel directly."""
    from dfd_clip_tpu.models import decoder as decoder_lib
    from dfd_clip_tpu.models.decoder import DecoderConfig, init_decoder

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_DEC_VJP", "1")  # single-chip default is XLA
    cfg = DecoderConfig(width=128, heads=2, num_frames=3,
                        layer_indices=(0, 1), out_dims=(2,))
    params = init_decoder(jax.random.key(0), cfg)
    kvs = {
        s: jnp.asarray(rng.standard_normal((2, 2, 3, 8, 2, 64)), jnp.float32)
        for s in ("k", "v")
    }
    m = jnp.ones((2, 3), bool)

    def loss(p):
        logits, _ = decoder_lib.apply_decoder(p, kvs, m, cfg, train=True)
        return logits[0].sum()

    g = jax.grad(loss)(params)  # would raise without the train gate
    leaf_sum = sum(
        float(np.abs(np.asarray(x)).sum())
        for x in jax.tree_util.tree_leaves(g)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    )
    assert np.isfinite(leaf_sum) and leaf_sum > 0

    # inference path still produces finite logits through the kernel
    logits, _ = decoder_lib.apply_decoder(params, kvs, m, cfg, train=False)
    assert np.isfinite(np.asarray(logits[0])).all()


@pytest.mark.parametrize("stacked", [False, True])
@pytest.mark.parametrize("with_pos", [False, True])
def test_decoder_vjp_grad_parity(rng, monkeypatch, stacked, with_pos):
    """The custom-VJP training path (Pallas forward in partials mode +
    hand-written XLA backward, ops/decoder_attention_vjp.py) must produce
    the same gradients as jax.grad through the XLA composition — for the
    trainable leaves (q_smax, q_coda, temporal_pos) — including masked
    tokens and a fully-masked sample."""
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_DEC_VJP", "1")  # single-chip default is XLA
    b, h, d, t, p = 3, 4, 32, 5, 8   # hd=128, 2h=8 -> batched-grid geometry
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    if stacked:
        k = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
        layer = 1
    else:
        k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        layer = None
    pos = (jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
           if with_pos else None)
    mask = np.ones((b, l), bool)
    mask[1, 3 * p:] = False
    mask[2, :] = False               # fully-masked sample: grads must be 0
    mask = jnp.asarray(mask)
    r = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)

    def loss(qs, qc, pos, differentiable):
        out = dual_activation_attention(
            qs, qc, k, v, mask, num_frames=t, temporal_pos=pos,
            layer=layer, differentiable=differentiable)
        return jnp.sum(out.astype(jnp.float32) * r)

    argnums = (0, 1, 2) if with_pos else (0, 1)
    got = jax.grad(lambda *a: loss(*a, pos=pos, differentiable=True)
                   if not with_pos else loss(*a, differentiable=True),
                   argnums=argnums)(qs, qc, *((pos,) if with_pos else ()))
    monkeypatch.setenv("DFD_DEC_VJP", "0")   # XLA fwd + autodiff bwd
    want = jax.grad(lambda *a: loss(*a, pos=pos, differentiable=True)
                    if not with_pos else loss(*a, differentiable=True),
                    argnums=argnums)(qs, qc, *((pos,) if with_pos else ()))
    for g, w, name in zip(got, want, ("q_smax", "q_coda", "pos")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)

    # value parity of the partials-reconstructed forward itself
    monkeypatch.setenv("DFD_DEC_VJP", "1")
    out_vjp = dual_activation_attention(
        qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=layer,
        differentiable=True)
    out_xla = dual_activation_attention(
        qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=layer,
        differentiable=False, )
    np.testing.assert_allclose(np.asarray(out_vjp), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-5)


def test_decoder_vjp_grad_parity_flagship_geometry(rng, monkeypatch):
    """Flagship head geometry (H=12, D=64): hpad8=16 != H exercises the
    Pallas backward's padded du accumulator rows, and 2H=24 its aligned
    sliced stores — the production shape class, shrunk in L/B."""
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_DEC_VJP", "1")
    b, h, d, t, p = 2, 12, 64, 3, 8
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[0, 2 * p:] = False
    mask = jnp.asarray(mask)
    r = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)

    def loss(qs, qc, pos):
        out = dual_activation_attention(
            qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=0,
            differentiable=True)
        return jnp.sum(out.astype(jnp.float32) * r)

    got = jax.grad(loss, argnums=(0, 1, 2))(qs, qc, pos)
    monkeypatch.setenv("DFD_DEC_BWD", "0")   # XLA stats backward
    want = jax.grad(loss, argnums=(0, 1, 2))(qs, qc, pos)
    for g, w, name in zip(got, want, ("q_smax", "q_coda", "pos")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_decoder_vjp_classic_grid_geometry(rng, monkeypatch):
    """Small-head geometry (2H % 8 != 0) falls back to the classic
    samples-outer grid; the VJP path must agree there too."""
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_DEC_VJP", "1")  # single-chip default is XLA
    b, h, d, t, p = 2, 2, 64, 3, 8
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = jnp.asarray(np.ones((b, l), bool))

    def loss(qs, qc, pos):
        out = dual_activation_attention(
            qs, qc, k, v, mask, num_frames=t, temporal_pos=pos,
            differentiable=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    got = jax.grad(loss, argnums=(0, 1, 2))(qs, qc, pos)
    monkeypatch.setenv("DFD_DEC_VJP", "0")
    want = jax.grad(loss, argnums=(0, 1, 2))(qs, qc, pos)
    for g, w, name in zip(got, want, ("q_smax", "q_coda", "pos")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("stacked", [False, True])
def test_decoder_vjp_kv_grads(rng, monkeypatch, stacked):
    """dK/dV through the custom-VJP path must match XLA autodiff. These
    cotangents are LIVE in adapter training (models/adapter.py inserts a
    trainable transform between the frozen exports and the decoder, so
    gradients must flow through the decoder's K/V inputs to reach the
    adapter); an earlier revision returned structural zeros, which would
    have silently frozen the adapter on the TPU training path."""
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_DEC_VJP", "1")  # single-chip default is XLA
    b, h, d, t, p = 3, 4, 32, 5, 8
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    if stacked:
        k = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
        layers = (0, 1)          # both slots used, cotangents accumulate
    else:
        k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        layers = (None,)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[1, 3 * p:] = False
    mask[2, :] = False
    mask = jnp.asarray(mask)
    r = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)

    def loss(k, v, qs, qc, pos):
        # adapter-style trainable transform is the K/V themselves here:
        # grads wrt k/v are exactly what an adapter's chain rule consumes
        tot = 0.0
        for layer in layers:
            out = dual_activation_attention(
                qs, qc, k, v, mask, num_frames=t, temporal_pos=pos,
                layer=layer, differentiable=True)
            tot = tot + jnp.sum(out.astype(jnp.float32) * r)
        return tot

    got = jax.jit(jax.grad(loss, argnums=(0, 1)))(k, v, qs, qc, pos)
    assert float(jnp.abs(got[0]).max()) > 0, "dK must not be structural zero"
    monkeypatch.setenv("DFD_DEC_VJP", "0")   # XLA fwd + autodiff bwd
    want = jax.jit(jax.grad(loss, argnums=(0, 1)))(k, v, qs, qc, pos)
    for g, w, name in zip(got, want, ("k", "v")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
    # masked tokens contribute nothing
    gk = np.asarray(got[0])
    sample_axis = 1 if stacked else 0
    assert np.all(np.take(gk, 2, axis=sample_axis) == 0)


@pytest.mark.parametrize("geo", [(2, 3, 16, 3, 7),      # tiny, nothing aligned
                                 (2, 5, 40, 4, 9),      # odd head count/dim, odd P
                                 (2, 12, 64, 4, 196)])  # ViT-L-decoder-like
def test_decoder_kernel_geometry_sweep(rng, monkeypatch, geo):
    """The decoder kernel routes through tile/grid fallbacks keyed on
    geometry (hd % 128, 2H % 8, lane padding): forced-Pallas forward must
    match XLA at deliberately awkward shapes, with masked rows."""
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    b, h, d, t, p = geo
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[0, l // 2:] = False
    mask = jnp.asarray(mask)
    got = dual_activation_attention(qs, qc, k, v, mask, num_frames=t,
                                    temporal_pos=pos)
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = dual_activation_attention(qs, qc, k, v, mask, num_frames=t,
                                     temporal_pos=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
