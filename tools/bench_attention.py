"""Micro-benchmark encoder-attention kernel variants on the real TPU.

Round-2 perf campaign instrumentation (PERF.md): the fused Pallas encoder
attention measured 4.4 ms/layer for (320, 197, 12, 64) — ~0.6 TFLOPS
effective, ~8x off the machine's GEMM ceiling, dominated by MXU issue
latency of tiny per-head matmuls (d=64 contractions half-fill the 128-lane
systolic array). This tool times isolated variants so kernel decisions are
measurement-driven, not vibes.

Timing methodology (PERF.md): `block_until_ready` is a no-op on the axon
platform, so each measurement chains ITERS dependent applications of the op
inside one jit (carry perturbation forces sequential execution) and reduces
to a scalar that is float()'d — wall time / ITERS is the per-op time.

Usage: python tools/bench_attention.py [variant ...]   (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

# Append (not prepend, and not via PYTHONPATH) the repo root: prepending
# shadows a stdlib/plugin module and breaks the axon TPU plugin load.
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, T, H, D = 320, 197, 12, 64  # ViT-B/16: 16 clips x 20 frames, 197 tokens
ITERS = 30
DTYPE = jnp.bfloat16


def time_op(fn, *args, iters=ITERS, name=""):
    """Median per-op seconds over 3 windows of `iters` chained applications."""

    @jax.jit
    def chained(args):
        q, rest = args[0], args[1:]

        def body(carry, _):
            out = fn(carry, *rest)
            # data dependency: next q nudged by out (same shape) to prevent CSE
            carry = carry + 1e-6 * out.astype(carry.dtype)
            return carry, ()

        final, _ = jax.lax.scan(body, q, (), length=iters)
        return jnp.sum(final.astype(jnp.float32))

    float(chained(args))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(args))
        times.append((time.perf_counter() - t0) / iters)
    t = sorted(times)[1]
    print(f"{name:34s} {t * 1e3:7.3f} ms   {flops() / t / 1e12:6.2f} TFLOPS-effective")
    return t


def flops():
    return 2 * N * H * (T * D * T + T * T * D)  # logits + mix


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(N, T, H, D)).astype(np.float32), DTYPE)
    return mk(), mk(), mk()


# -- variants -------------------------------------------------------------------

def xla_einsum(q, k, v):
    scale = D ** -0.5
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


def pallas_current(q, k, v):
    from dfd_clip_tpu.ops.pallas_attention import fused_encoder_attention

    return fused_encoder_attention(q, k, v)


def _frames_grid_call(kernel, q, k, v, frames_per_step, t_pad=None):
    """Common pallas_call wrapper: F frames per grid step, flat (T, H*D) blocks."""
    tp = t_pad or T
    hd = H * D
    qf = q.reshape(N, T, hd)
    kf = k.reshape(N, T, hd)
    vf = v.reshape(N, T, hd)
    if tp != T:
        pad = ((0, 0), (0, tp - T), (0, 0))
        qf, kf, vf = (jnp.pad(a, pad) for a in (qf, kf, vf))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, tp, hd), q.dtype),
        grid=(N // frames_per_step,),
        in_specs=[
            pl.BlockSpec(
                (frames_per_step, tp, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 3,
        out_specs=pl.BlockSpec(
            (frames_per_step, tp, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return out[:, :T].reshape(N, T, H, D)


def make_multiframe_kernel(frames_per_step, t_pad=None):
    """Per-head unrolled, phase-separated, F frames per grid step."""
    tp = t_pad or T

    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = D ** -0.5
        head = lambda h: slice(h * D, (h + 1) * D)
        if tp != T:
            col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
            pad_mask = col >= T
        for f in range(frames_per_step):
            qf = q_ref[f].astype(jnp.float32)
            kf = k_ref[f].astype(jnp.float32)
            vf = v_ref[f].astype(jnp.float32)
            logits = [
                jax.lax.dot_general(
                    qf[:, head(h)] * scale, kf[:, head(h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                )
                for h in range(H)
            ]
            if tp != T:
                logits = [jnp.where(pad_mask, -jnp.inf, l) for l in logits]
            probs = []
            for l in logits:
                m = jnp.max(l, axis=-1, keepdims=True)
                p = jnp.exp(l - m)
                probs.append(p / jnp.sum(p, axis=-1, keepdims=True))
            for h in range(H):
                o_ref[f, :, head(h)] = jnp.dot(
                    probs[h], vf[:, head(h)], preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

    return kernel


def make_batched_dot_kernel(frames_per_step):
    """One batched dot_general over all heads per frame (Mosaic batched matmul)."""

    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = D ** -0.5
        for f in range(frames_per_step):
            qf = q_ref[f].astype(jnp.float32).reshape(T, H, D).transpose(1, 0, 2)
            kf = k_ref[f].astype(jnp.float32).reshape(T, H, D).transpose(1, 0, 2)
            vf = v_ref[f].astype(jnp.float32).reshape(T, H, D).transpose(1, 0, 2)
            logits = jax.lax.dot_general(
                qf * scale, kf, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, T, T)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            mix = jax.lax.dot_general(
                p, vf, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )  # (H, T, D)
            o_ref[f] = mix.transpose(1, 0, 2).reshape(T, H * D).astype(o_ref.dtype)

    return kernel


def make_pair_packed_kernel(frames_per_step, t_pad):
    """Head-pair block-diagonal logits: full 128-lane contractions.

    For heads (2h, 2h+1): Q2 = [Q_a | Q_b] (Tp, 128); K2 block-diag (2Tp, 128)
    with K_a in rows [0,Tp) cols [0,64) and K_b in rows [Tp,2Tp) cols [64,128).
    Q2 @ K2^T = [L_a | L_b] (Tp, 2Tp) in ONE full-width matmul. Tp=256 keeps
    every block slice 128-aligned; pad columns are masked to -inf.
    """
    tp = t_pad

    def kernel(q_ref, k_ref, v_ref, o_ref, k2_scratch):
        scale = D ** -0.5
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        pad_mask = col >= T  # (tp, tp) True where key index is padding
        for f in range(frames_per_step):
            qf = q_ref[f].astype(jnp.float32)
            kf = k_ref[f].astype(jnp.float32)
            vf = v_ref[f].astype(jnp.float32)
            for hp in range(H // 2):
                a, b = 2 * hp, 2 * hp + 1
                q2 = qf[:, a * D : (b + 1) * D]  # (tp, 128)
                k2_scratch[:] = jnp.zeros((2 * tp, 2 * D), jnp.float32)
                k2_scratch[0:tp, 0:D] = kf[:, a * D : a * D + D]
                k2_scratch[tp : 2 * tp, D : 2 * D] = kf[:, b * D : b * D + D]
                logits = jax.lax.dot_general(
                    q2 * scale, k2_scratch[:],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                )  # (tp, 2tp) = [L_a | L_b]
                for j, h in enumerate((a, b)):
                    l = logits[:, j * tp : (j + 1) * tp]
                    l = jnp.where(pad_mask, -jnp.inf, l)
                    mx = jnp.max(l, axis=-1, keepdims=True)
                    p = jnp.exp(l - mx)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    o_ref[f, :, h * D : (h + 1) * D] = jnp.dot(
                        p, vf[:, h * D : (h + 1) * D],
                        preferred_element_type=jnp.float32,
                    ).astype(o_ref.dtype)

    return kernel


VARIANTS = {}


def variant(name):
    def deco(fn):
        VARIANTS[name] = fn
        return fn

    return deco


variant("xla_einsum")(xla_einsum)
variant("pallas_current")(pallas_current)

for F in (2, 4, 8):
    VARIANTS[f"pallas_frames{F}"] = functools.partial(
        lambda q, k, v, F: _frames_grid_call(make_multiframe_kernel(F), q, k, v, F), F=F
    )

VARIANTS["pallas_batched_dot"] = lambda q, k, v: _frames_grid_call(
    make_batched_dot_kernel(2), q, k, v, 2
)


def pair_packed(q, k, v, F=2, tp=256):
    hd = H * D
    kernel = make_pair_packed_kernel(F, tp)
    qf = jnp.pad(q.reshape(N, T, hd), ((0, 0), (0, tp - T), (0, 0)))
    kf = jnp.pad(k.reshape(N, T, hd), ((0, 0), (0, tp - T), (0, 0)))
    vf = jnp.pad(v.reshape(N, T, hd), ((0, 0), (0, tp - T), (0, 0)))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, tp, hd), q.dtype),
        grid=(N // F,),
        in_specs=[
            pl.BlockSpec((F, tp, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_specs=pl.BlockSpec((F, tp, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * tp, 2 * D), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return out[:, :T].reshape(N, T, H, D)


VARIANTS["pallas_pair_packed"] = pair_packed


def make_full_packed_kernel(frames_per_step, tp):
    """Block-diag head pairs for BOTH matmuls, bf16 MXU inputs.

    QK^T: [Q_a|Q_b] (tp,128) x blockdiag(K_a,K_b) (2tp,128) -> [L_a|L_b].
    PV:   [P_a|P_b] (tp,2tp) x blockdiag(V_a,V_b) (2tp,128) -> [O_a|O_b].
    All contractions fill 128 lanes; probs stay in VMEM; logits accumulate in
    f32 via preferred_element_type (no explicit f32 conversion of Q/K/V).
    """

    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = D ** -0.5
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
        pad = col >= T
        zeros = jnp.zeros((tp, D), DTYPE)

        def blockdiag(a_part, b_part):
            # [[A, 0], [0, B]]: (2tp, 2D), assembled as SSA values — scratch
            # ref writes across unrolled iterations trip a Mosaic WAR hazard
            # (silent corruption of all but the last iteration).
            top = jnp.concatenate([a_part, zeros], axis=1)
            bot = jnp.concatenate([zeros, b_part], axis=1)
            return jnp.concatenate([top, bot], axis=0)

        for f in range(frames_per_step):
            for hp in range(H // 2):
                a = 2 * hp * D
                q2 = q_ref[f, :, a : a + 2 * D]  # (tp, 128) bf16
                kblk = blockdiag(k_ref[f, :, a : a + D], k_ref[f, :, a + D : a + 2 * D])
                vblk = blockdiag(v_ref[f, :, a : a + D], v_ref[f, :, a + D : a + 2 * D])
                logits = jax.lax.dot_general(
                    q2, kblk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale  # (tp, 2tp)
                probs = []
                for j in range(2):
                    l = jnp.where(pad, -jnp.inf, logits[:, j * tp : (j + 1) * tp])
                    mx = jnp.max(l, axis=-1, keepdims=True)
                    p = jnp.exp(l - mx)
                    probs.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(DTYPE))
                pblk = jnp.concatenate(probs, axis=1)  # (tp, 2tp)
                o_ref[f, :, a : a + 2 * D] = jnp.dot(
                    pblk, vblk, preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

    return kernel


def full_packed(q, k, v, F=2, tp=256):
    hd = H * D
    kernel = make_full_packed_kernel(F, tp)
    qf = jnp.pad(q.reshape(N, T, hd), ((0, 0), (0, tp - T), (0, 0)))
    kf = jnp.pad(k.reshape(N, T, hd), ((0, 0), (0, tp - T), (0, 0)))
    vf = jnp.pad(v.reshape(N, T, hd), ((0, 0), (0, tp - T), (0, 0)))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, tp, hd), q.dtype),
        grid=(N // F,),
        in_specs=[
            pl.BlockSpec((F, tp, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        * 3,
        out_specs=pl.BlockSpec((F, tp, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return out[:, :T].reshape(N, T, H, D)


VARIANTS["pallas_full_packed"] = full_packed
VARIANTS["pallas_full_packed_f4"] = functools.partial(full_packed, F=4)


def make_bf16_kernel(frames_per_step):
    """Like the current kernel but feeds bf16 straight into the MXU
    (f32 accumulation via preferred_element_type) — the current kernel's
    up-front .astype(f32) forces multi-pass f32 MXU matmuls."""

    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = D ** -0.5
        head = lambda h: slice(h * D, (h + 1) * D)
        for f in range(frames_per_step):
            qf, kf, vf = q_ref[f], k_ref[f], v_ref[f]  # (T, H*D) bf16
            logits = [
                jax.lax.dot_general(
                    qf[:, head(h)], kf[:, head(h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ) * scale
                for h in range(H)
            ]
            probs = []
            for l in logits:
                m = jnp.max(l, axis=-1, keepdims=True)
                p = jnp.exp(l - m)
                probs.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(DTYPE))
            for h in range(H):
                o_ref[f, :, head(h)] = jnp.dot(
                    probs[h], vf[:, head(h)], preferred_element_type=jnp.float32
                ).astype(o_ref.dtype)

    return kernel


for F in (1, 2, 4):
    VARIANTS[f"pallas_bf16_f{F}"] = functools.partial(
        lambda q, k, v, F: _frames_grid_call(make_bf16_kernel(F), q, k, v, F), F=F
    )


def make_diet_kernel(frames_per_step, with_max):
    """Softmax diet: normalization moved to the (T, D) output epilogue
    instead of the (T, T) probs (saves a full VPU pass over probs); optional
    no-max variant (exp overflows f32 only past logit ~88)."""

    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = D ** -0.5
        head = lambda h: slice(h * D, (h + 1) * D)
        for f in range(frames_per_step):
            qf, kf, vf = q_ref[f], k_ref[f], v_ref[f]
            logits = [
                jax.lax.dot_general(
                    qf[:, head(h)], kf[:, head(h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ) * scale
                for h in range(H)
            ]
            ps, sums = [], []
            for l in logits:
                p = jnp.exp(l - jnp.max(l, axis=-1, keepdims=True)) if with_max else jnp.exp(l)
                ps.append(p.astype(DTYPE))
                sums.append(jnp.sum(p, axis=-1, keepdims=True))  # (T, 1)
            for h in range(H):
                o = jnp.dot(ps[h], vf[:, head(h)], preferred_element_type=jnp.float32)
                o_ref[f, :, head(h)] = (o / sums[h]).astype(o_ref.dtype)

    return kernel


for F in (1, 2):
    VARIANTS[f"pallas_diet_max_f{F}"] = functools.partial(
        lambda q, k, v, F: _frames_grid_call(make_diet_kernel(F, True), q, k, v, F), F=F
    )
    VARIANTS[f"pallas_diet_nomax_f{F}"] = functools.partial(
        lambda q, k, v, F: _frames_grid_call(make_diet_kernel(F, False), q, k, v, F), F=F
    )
VARIANTS["pallas_pad256"] = lambda q, k, v: _frames_grid_call(
    make_multiframe_kernel(2, t_pad=256), q, k, v, 2, t_pad=256
)


def main():
    names = sys.argv[1:] or list(VARIANTS)
    q, k, v = make_inputs()
    print(f"shapes: N={N} T={T} H={H} D={D} dtype={DTYPE.__name__}, "
          f"backend={jax.default_backend()}")
    # correctness on a slice (full arrays are 120 MB — slow over the tunnel)
    check = jax.jit(lambda o: o[:4].astype(jnp.float32))
    ref = np.asarray(check(xla_einsum(q, k, v)))
    results = {}
    for name in names:
        fn = VARIANTS[name]
        out = np.asarray(check(fn(q, k, v)))
        err = np.max(np.abs(out - ref))
        assert err < 0.05, f"{name}: wrong result, max err {err}"
        results[name] = time_op(lambda q, k=k, v=v, fn=fn: fn(q, k, v), q, name=name)
    best = min(results, key=results.get)
    print(f"best: {best} ({results[best]*1e3:.3f} ms)")


if __name__ == "__main__":
    main()
