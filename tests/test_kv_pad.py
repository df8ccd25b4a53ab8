"""Tile-aligned (padded) K/V export parity (clip_vit pad_tokens).

The round-4 predict trace showed the decoder-side (T, P) -> (T*P) token
merge materializing a ~578 MB copy for each of K and V (2 x 1.78 ms/batch at
flagship shapes) because P=196 is not 8-row tile aligned. pad_tokens exports
P zero rows up to the next multiple of 8 so the merge compiles to a layout
bitcast; the decoder masks pad tokens as keys (patch_valid). These tests pin
the contract: padded exports carry the exact unpadded values in rows [:P],
zeros after, and the end-to-end predict is numerically unchanged.

Reference workload: /root/reference/src/models.py:498-566 (predict graph).
"""

import os

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
    return np.random.default_rng(11)


def _tower_io(rng, n=4, arch="ViT-Test"):
    cfg = ARCHITECTURES[arch]
    params = init_clip_vision(jax.random.key(5), cfg)
    x = jnp.asarray(
        rng.standard_normal((n, 3, cfg.input_resolution, cfg.input_resolution)),
        jnp.float32,
    )
    return cfg, params, x


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize(
    "mode", ["bf16", "int8", "rows8"], ids=["bf16", "compute_int8", "kv_rows8"]
)
def test_padded_export_matches_exact(rng, monkeypatch, backend, mode):
    """rows [:P] of the padded export == the exact export; rows [P:] zero."""
    cfg, params, x = _tower_io(rng)
    keep = (1, 2)
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", backend)
    kw = dict(
        compute_dtype=jnp.float32, keep_layers=keep, drop_cls=True,
        compute_int8=mode == "int8", kv_int8_rows=mode == "rows8",
    )
    want = clip_vision_kv(params, x, cfg, **kw)
    got = clip_vision_kv(params, x, cfg, pad_tokens=True, **kw)

    p = want["k"].shape[2]
    p_pad = -(-p // 8) * 8
    for name in want:
        assert got[name].shape[2] == p_pad, (name, got[name].shape)
        np.testing.assert_array_equal(
            np.asarray(got[name][:, :, :p]), np.asarray(want[name]), err_msg=name
        )
    for name in ("k", "v"):
        assert not np.asarray(got[name][:, :, p:]).any(), f"{name} pad rows not zero"


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_predict_unchanged_by_padding(monkeypatch, backend):
    """End-to-end predict: DFD_KV_PAD8 on vs off is numerically identical
    (pad keys fully masked in both attention activations)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import tiny_detector

    model = tiny_detector()
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(3)
    size = model.transform.size
    x = rng.integers(0, 255, (2, 4, 3, size, size), np.uint8)
    m = np.ones((2, 4), bool)
    m[1, 2:] = False  # exercise frame masking combined with patch padding

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", backend)
    monkeypatch.setenv("DFD_KV_PAD8", "0")
    base = np.asarray(model.predict(params, x, m)[0][0], np.float32)
    monkeypatch.setenv("DFD_KV_PAD8", "1")
    pad = np.asarray(model.predict(params, x, m)[0][0], np.float32)
    np.testing.assert_allclose(pad, base, atol=5e-6, rtol=1e-5)


def test_train_and_adapter_paths_keep_exact_export(monkeypatch):
    """Padding must stay OFF for adapter models: patch-coupled adapter
    variants (nln joint-LN, BN spatial stats) and the per-patch
    sync-compression loss (adapter-only) would see pad rows. Train-mode
    predict PADS since round 5 (the same merge copies sat inside the grad
    step); test_train_forward_unchanged_by_padding pins its numerics."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import tiny_detector

    monkeypatch.setenv("DFD_KV_PAD8", "1")
    model = tiny_detector()
    params = model.init_params(jax.random.key(0))
    p_exact = model.vit_cfg.num_patches

    kvs = model.encode_kv(params, jnp.zeros((1, 2, 3, 32, 32), jnp.float32))
    assert kvs["k"].shape[3] == p_exact  # default: no padding requested

    kvs = model.encode_kv(
        params, jnp.zeros((1, 2, 3, 32, 32), jnp.float32), pad_tokens=True
    )
    assert kvs["k"].shape[3] == -(-p_exact // 8) * 8

    adapter = tiny_detector(adapter={"structure": "adapter"})
    aparams = adapter.init_params(jax.random.key(1))
    rng = np.random.default_rng(5)
    x = rng.integers(0, 255, (1, 2, 3, 32, 32), np.uint8)
    m = np.ones((1, 2), bool)
    # must run without shape errors: the adapter path keeps the exact export
    adapter.predict(aparams, x, m)
    # train-mode predict pads and must run without shape errors
    model.predict(params, x, m, train=True, rng=jax.random.key(2))


def test_train_forward_unchanged_by_padding(monkeypatch):
    """The padded export must not change the train-mode forward: at
    dropout=0 the logits and losses are numerically identical with
    DFD_KV_PAD8 on/off (pad rows are masked as keys via patch_valid).
    (Under dropout>0 the padded key axis changes the dropout mask draw —
    statistically equivalent, not bit-equal; compare at 0.)"""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import tiny_detector

    model = tiny_detector(dropout=0.0)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(7)
    x = rng.integers(0, 255, (2, 3, 3, 32, 32), np.uint8)
    m = np.ones((2, 3), bool)
    m[1, 2] = False
    y = jnp.asarray([0, 1], jnp.int32)

    outs = {}
    for pad in ("1", "0"):
        monkeypatch.setenv("DFD_KV_PAD8", pad)
        losses, logits, other = model.forward(
            params, jnp.asarray(x), [y], jnp.asarray(m), train=True,
            single_task=0, rng=jax.random.key(3))
        outs[pad] = (np.asarray(losses[0]), np.asarray(logits[0]))
    np.testing.assert_allclose(outs["1"][0], outs["0"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(outs["1"][1], outs["0"][1],
                               rtol=1e-5, atol=1e-6)
