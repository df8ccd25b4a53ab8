"""shard_map-Pallas multi-device path vs the GSPMD/XLA composition.

Round-2 verdict item #2: the fused kernels must survive multi-chip. These
tests force the spmd path on the virtual 8-device CPU mesh (Pallas interpret
mode) via DFD_SPMD_PALLAS=1 and assert it matches the multi-device XLA
program numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.ops import spmd
from dfd_clip_tpu.ops.decoder_attention import dual_activation_attention
from dfd_clip_tpu.runtime import mesh as mesh_rt
from dfd_clip_tpu.runtime.mesh import MeshRuntime


@pytest.fixture
def mesh42():
    """(data=4, seq=2) mesh registered as the process mesh; restores after."""
    prev = mesh_rt.current_mesh()
    rt = MeshRuntime(seq_parallel=2)
    yield rt.mesh
    mesh_rt.set_current_mesh(prev)


def test_spmd_mesh_selection(mesh42, monkeypatch):
    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    assert spmd.spmd_pallas_mesh() is mesh42
    monkeypatch.setenv("DFD_SPMD_PALLAS", "0")
    assert spmd.spmd_pallas_mesh() is None
    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    assert spmd.spmd_pallas_mesh() is None
    monkeypatch.delenv("DFD_ATTENTION_BACKEND")
    # CPU default ("auto") keeps the path off outside TPU
    monkeypatch.setenv("DFD_SPMD_PALLAS", "auto")
    assert spmd.spmd_pallas_mesh() is None


def test_spmd_decoder_attention_matches_xla(rng, mesh42, monkeypatch):
    """Sequence-sharded kernel partials + psum combine == XLA, including a
    ragged mask and large trained-query logits, stacked and flat K/V."""
    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    b, h, d, t, p = 4, 4, 64, 4, 8
    l = t * p
    qs = jnp.asarray(20.0 * rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(20.0 * rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[1, p:] = False       # only the first frame's shard has real tokens
    mask[2, : 3 * p] = False
    mask = jnp.asarray(mask)

    for layer in (0, 1):
        got = spmd.spmd_decoder_attention(qs, qc, k, v, mask, pos, layer, mesh42)
        monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
        want = dual_activation_attention(
            qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=layer
        )
        monkeypatch.delenv("DFD_ATTENTION_BACKEND")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    # dispatcher integration: with the mesh registered and the env set, the
    # plain op call must route through the spmd path and still match
    got2 = dual_activation_attention(
        qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=1
    )
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want2 = dual_activation_attention(
        qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=1
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-5
    )


def test_spmd_predict_matches_gspmd(rng, mesh42, monkeypatch):
    """Full Detector.predict: shard_map-Pallas (interpret) == multi-device
    GSPMD/XLA on sharded inputs — encoder tower AND decoder attention."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dfd_clip_tpu.models.detector import Detector

    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "architecture": "ViT-Test",
            "decode_mode": "index",
            "decode_indices": [0, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
        }
    )
    model = Detector(cfg, num_frames=4, compute_dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))

    b, t = 4, 4
    x = rng.integers(0, 255, (b, t, 3, 32, 32), np.uint8)
    m = np.ones((b, t), bool)
    m[0, 2:] = False  # ragged clip

    xs = jax.device_put(x, NamedSharding(mesh42, P("data", "seq")))
    ms = jax.device_put(m, NamedSharding(mesh42, P("data")))

    predict = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])

    monkeypatch.setenv("DFD_SPMD_PALLAS", "0")
    want = np.asarray(predict(params, xs, ms))

    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    predict_spmd = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
    got = np.asarray(predict_spmd(params, xs, ms))

    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_spmd_megakernel_predict_matches_gspmd(rng, mesh42, monkeypatch):
    """The whole-encoder megakernel under shard_map: each shard runs the
    tower kernel on its local (data, seq) slab; result == multi-device
    GSPMD/XLA. Contiguous keep range + compute_int8 (the megakernel's
    production config, int8 tolerance)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dfd_clip_tpu.models.detector import Detector

    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "architecture": "ViT-Test",
            "decode_mode": "index",
            "decode_indices": [1, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
            "op_mode": {"temporal_position": 1, "compute_int8": 1},
        }
    )
    model = Detector(cfg, num_frames=4, compute_dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))

    b, t = 4, 4
    x = rng.integers(0, 255, (b, t, 3, 32, 32), np.uint8)
    m = np.ones((b, t), bool)

    xs = jax.device_put(x, NamedSharding(mesh42, P("data", "seq")))
    ms = jax.device_put(m, NamedSharding(mesh42, P("data")))

    monkeypatch.setenv("DFD_SPMD_PALLAS", "0")
    predict = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
    want = np.asarray(predict(params, xs, ms))

    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    prepared = model.prepare_params(params)
    predict_spmd = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
    got = np.asarray(predict_spmd(prepared, xs, ms))

    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_spmd_falls_back_on_indivisible_shapes(rng, mesh42, monkeypatch):
    """Batch/frames not divisible by the mesh: the GSPMD path must be used
    (no shard_map error), producing normal finite logits."""
    from dfd_clip_tpu.models.detector import Detector

    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "architecture": "ViT-Test",
            "decode_mode": "index",
            "decode_indices": [0, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
        }
    )
    model = Detector(cfg, num_frames=3, compute_dtype=jnp.float32)
    params = model.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (3, 3, 3, 32, 32), np.uint8)  # 3 % 4 != 0
    m = np.ones((3, 3), bool)
    logits, _ = model.predict(params, x, m)
    assert np.isfinite(np.asarray(logits[0])).all()


def test_spmd_decoder_vjp_grad_parity(rng, mesh42, monkeypatch):
    """Multi-chip TRAINING keeps the decoder kernel: the spmd custom-VJP
    form (shard_map-Pallas forward + stats-based GSPMD backward,
    ops/decoder_attention_vjp.py) must match jax.grad of the multi-device
    XLA composition for q_smax, q_coda, temporal_pos AND the stacked k/v
    export buffers (live cotangents in adapter training)."""
    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    b, h, d, t, p = 4, 4, 64, 4, 8
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, b, l, h, d)), jnp.float32)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[1, p:] = False
    mask = jnp.asarray(mask)
    r = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)

    def loss(qs, qc, pos, k, v):
        out = dual_activation_attention(
            qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=1,
            differentiable=True)
        return jnp.sum(out.astype(jnp.float32) * r)

    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(qs, qc, pos, k, v)
    assert float(jnp.abs(got[3]).max()) > 0, "dK must not be structural zero"
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(qs, qc, pos, k, v)
    for g, w, name in zip(got, want, ("q_smax", "q_coda", "pos", "k", "v")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_spmd_decoder_int8_rows_matches_xla(rng, mesh42, monkeypatch):
    """int8_rows K/V through the spmd combine: per-shard in-VMEM dequant ==
    the XLA dequant path, stacked buffers + per-row scales sharded like K/V."""
    monkeypatch.setenv("DFD_SPMD_PALLAS", "1")
    b, h, d, t, p = 4, 4, 64, 4, 8
    l = t * p
    qs = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    kf = rng.standard_normal((2, b, l, h, d)).astype(np.float32)
    vf = rng.standard_normal((2, b, l, h, d)).astype(np.float32)

    def quant_rows(x):
        s = np.abs(x).reshape(*x.shape[:3], -1).max(-1, keepdims=True) / 127.0
        s = np.maximum(s, 1e-8)
        q = np.clip(np.round(x / s[..., None]), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    k, ks = quant_rows(kf)
    v, vs = quant_rows(vf)
    pos = jnp.asarray(0.2 * rng.standard_normal((l, h, d)), jnp.float32)
    mask = np.ones((b, l), bool)
    mask[0, 2 * p:] = False
    mask = jnp.asarray(mask)

    got = dual_activation_attention(
        qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=1,
        k_scale=ks, v_scale=vs)
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "xla")
    want = dual_activation_attention(
        qs, qc, k, v, mask, num_frames=t, temporal_pos=pos, layer=1,
        k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-3)
