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
