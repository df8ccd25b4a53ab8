"""Whole-encoder megakernel (ops/pallas_tower.py) parity vs the XLA
composition, in interpreter mode on CPU.

The megakernel is the round-3 structural perf lever (PERF.md): one Pallas
call runs the full layer stack with the residual stream carried in VMEM
scratch and K/V exported by manual DMA. Math must be identical to the
unrolled per-layer path; only the schedule and memory movement differ.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.models.clip_vit import (
    ARCHITECTURES,
    clip_vision_kv,
    init_clip_vision,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _tower_io(rng, arch="ViT-Test"):
    cfg = ARCHITECTURES[arch]
    params = init_clip_vision(jax.random.key(3), cfg)
    x = jnp.asarray(
        rng.standard_normal((4, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    return cfg, params, x


@pytest.mark.parametrize("drop_cls", [True, False])
@pytest.mark.parametrize("int8", [False, True])
def test_megakernel_matches_xla(rng, monkeypatch, drop_cls, int8):
    cfg, params, x = _tower_io(rng)
    keep = (1, 2)  # contiguous tail of the 3-layer test tower

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=drop_cls,
                          compute_int8=int8)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=drop_cls,
                         compute_int8=int8)

    # int8 per-row activation quantization differs slightly between the
    # in-kernel and linear_w8a8 compositions (same tolerance as the
    # whole-block kernel tests).
    tol = 5e-2 if int8 else 5e-4
    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=tol, atol=tol
        )


@pytest.mark.parametrize("mode", ["1", "qk"])
def test_megakernel_int8_attention(rng, monkeypatch, mode):
    """DFD_INT8_ATTN: the attention logits/PV GEMMs also run int8. An
    approximation (int8 rounding on Q/K/P/V), so the tolerance is the int8
    drift band; the end-to-end AUROC gate lives in test_int8_e2e.py."""
    cfg, params, x = _tower_io(rng)
    keep = (1, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True, compute_int8=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    monkeypatch.setenv("DFD_INT8_ATTN", mode)
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True, compute_int8=True)
    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=8e-2, atol=8e-2
        )


@pytest.mark.parametrize("int8_attn", [None, "1"])
def test_megakernel_wide_head_dim(rng, monkeypatch, int8_attn):
    """ViT-Test-Wide (head_dim=64, the production value): guards the
    kernels' head-slice index math that head_dim=16 cannot — the chip
    megaL ladder runs the same structure at ViT-L/14 (w=1024, hd=64)."""
    cfg, params, x = _tower_io(rng, arch="ViT-Test-Wide")
    keep = (1, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True, compute_int8=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    if int8_attn:
        monkeypatch.setenv("DFD_INT8_ATTN", int8_attn)
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True, compute_int8=True)
    tol = 8e-2 if int8_attn else 5e-2
    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=tol, atol=tol
        )


@pytest.mark.parametrize("phase", ["full", "mlp"])
def test_whole_block_int8_attention(rng, monkeypatch, phase):
    """DFD_INT8_ATTN on the per-layer whole-block kernel (both phase
    schedules) — the non-megakernel composition of the same int8 attention
    math (pallas_attention._attn_int8_cols)."""
    cfg, params, x = _tower_io(rng)
    keep = (1, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True, compute_int8=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_FUSED_BLOCK", "full")
    monkeypatch.setenv("DFD_PHASE_MAJOR", phase)
    monkeypatch.setenv("DFD_INT8_ATTN", "1")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True, compute_int8=True)
    for name in ("k", "v"):
        assert got[name].shape == want[name].shape
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=8e-2, atol=8e-2
        )


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_prepare_int8_params_matches_traced_quant(rng, monkeypatch, backend):
    """prepare_int8_params (pre-quantized "wq"/"ws" leaves) must be
    numerically identical to trace-time quantization on every compute_int8
    path — same absmax math on the same weights, just hoisted out of the
    jitted graph."""
    from dfd_clip_tpu.models.clip_vit import prepare_int8_params

    cfg, params, x = _tower_io(rng)
    keep = (1, 2)
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", backend)
    if backend == "pallas":
        monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True, compute_int8=True)
    got = clip_vision_kv(prepare_int8_params(params), x, cfg,
                         compute_dtype=jnp.float32, keep_layers=keep,
                         drop_cls=True, compute_int8=True)
    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=1e-6, atol=1e-6
        )


def test_megakernel_keep_all_layers(rng, monkeypatch):
    """keep_layers=None (all layers export) is a contiguous range from 0."""
    cfg, params, x = _tower_io(rng)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          drop_cls=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         drop_cls=True)
    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=5e-4, atol=5e-4
        )


def test_megakernel_skipped_for_noncontiguous_keep(rng, monkeypatch):
    """Non-contiguous keep sets fall back to the per-layer kernels (and stay
    correct) even with DFD_MEGAKERNEL=1."""
    cfg, params, x = _tower_io(rng)
    keep = (0, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True)
    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=5e-4, atol=5e-4
        )


@pytest.mark.parametrize("int8", [False, True])
def test_megakernel_windowed_export(rng, monkeypatch, int8):
    """DFD_TOWER_EXPORT=window: slot-indexed output windows instead of
    manual DMA — the Mosaic-fallback export mechanism. Same math."""
    cfg, params, x = _tower_io(rng)
    keep = (1, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True, compute_int8=int8)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    monkeypatch.setenv("DFD_TOWER_EXPORT", "window")
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True, compute_int8=int8)
    tol = 5e-2 if int8 else 5e-4
    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=tol, atol=tol
        )


@pytest.mark.parametrize("frames,group", [(2, 2), (4, 2), (4, 1)])
def test_megakernel_chunk_geometries(rng, monkeypatch, frames, group):
    """Chunk/group knobs change only the schedule, never the math."""
    cfg, params, x = _tower_io(rng)
    keep = (1, 2)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                          keep_layers=keep, drop_cls=True)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    monkeypatch.setenv("DFD_TOWER_FRAMES", str(frames))
    monkeypatch.setenv("DFD_TOWER_GROUP", str(group))
    got = clip_vision_kv(params, x, cfg, compute_dtype=jnp.float32,
                         keep_layers=keep, drop_cls=True)
    for name in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(got[name]), np.asarray(want[name]), rtol=5e-4, atol=5e-4
        )


def test_megakernel_detector_predict(rng, monkeypatch):
    """End-to-end: Detector.predict with the megakernel enabled equals the
    default path (the decoder consumes megakernel-exported K/V)."""
    from dfd_clip_tpu.models.detector import Detector

    def build():
        cfg = Detector.get_default_config()
        cfg.merge_from_other_cfg({
            "architecture": "ViT-Test", "decode_mode": "index",
            "decode_indices": [1, 2], "out_dim": [2], "losses": ["auc_roc"],
            "op_mode": {"temporal_position": 1}})
        return Detector(cfg, num_frames=4)

    x = rng.integers(0, 255, (2, 4, 3, 32, 32)).astype(np.uint8)
    m = np.ones((2, 4), bool)
    # baseline = per-layer whole-block Pallas kernels — the same numerics as
    # the megakernel (h-mid stays f32 inside the block; bf16 only between
    # layers), so the delta isolates the megakernel's restructuring
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    monkeypatch.setenv("DFD_FUSED_BLOCK", "full")
    det = build()
    params = det.init_params(jax.random.key(0))
    base = np.asarray(det.predict(params, x, m)[0][0])

    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    out = np.asarray(build().predict(params, x, m)[0][0])
    np.testing.assert_allclose(out, base, rtol=2e-3, atol=2e-3)
