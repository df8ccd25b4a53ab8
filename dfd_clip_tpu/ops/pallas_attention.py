"""Pallas fused attention kernels.

The TPU-native replacements for the xFormers CUDA kernels of the reference
(SURVEY.md §2.9 #5).

``fused_encoder_attention`` — full softmax self-attention for the frozen ViT
(197 tokens/frame, unmasked). One grid step processes ALL heads of one frame
from a single (T, H*D) VMEM block: logits -> softmax -> weighted sum stay in
VMEM, the (T, T) probabilities never touch HBM, and the per-head loop is
statically unrolled (grid = batch, not batch*heads — fewer, larger DMAs).

Measured honestly on v5e (scalar-reduced outputs; `block_until_ready` is a
no-op on the axon platform — see PERF.md): 4.9 ms vs 10.0 ms XLA for
320x197x12x64, i.e. the encoder's attention cost halves. Selected by default
on TPU (DFD_ATTENTION_BACKEND=xla opts out).

On CPU (tests) the kernels run in interpreter mode automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params(default_mb: int = 64):
    """Raise Mosaic's scoped-VMEM ceiling for the fused kernels.

    The default scoped limit is 16 MB of the v5e's 128 MB VMEM; the
    whole-block kernels with phased (frame-interleaved) scheduling carry
    ~17-30 MB of live intermediates, which the default rejects at compile
    time ('exceeded scoped vmem limit'). 64 MB leaves half the VMEM for
    the pipeline's double-buffered DMA windows; the tower megakernel's
    windowed-export form double-buffers ~1.2 MB/frame of K/V windows and
    passes 96. DFD_VMEM_LIMIT_MB overrides."""
    import os

    mb = int(os.environ.get("DFD_VMEM_LIMIT_MB", str(default_mb)))
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


_LOGIT_CLAMP = 60.0  # exp(60)=1.1e26, far from f32 overflow; frozen-CLIP
                     # attention logits stay well below this in practice


def _exp_probs(l):
    """exp for the encoder softmax (normalization deferred to the PV
    epilogue). The min-clamp costs one VPU pass over every (T, T) logits
    tile (~1 ms/predict across 12 layers x 12 heads at flagship shapes);
    DFD_NO_CLAMP=1 drops it. Safe only while max |logit| < ~88 (f32 exp
    overflow): the tower is FROZEN, so the bound is a checkpoint property —
    scripts/validate_parity.py reports the real checkpoint's max attention
    logit next to the int8 gates before this knob is enabled in production."""
    import os

    if os.environ.get("DFD_NO_CLAMP") == "1":
        return jnp.exp(l)
    return jnp.exp(jnp.minimum(l, _LOGIT_CLAMP))


def _make_encoder_kernel(heads: int, head_dim: int, frames: int):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        scale = head_dim ** -0.5

        def head(h):
            return slice(h * head_dim, (h + 1) * head_dim)

        # Phase separation (all logits -> all softmaxes -> all mixes) lets
        # Mosaic overlap MXU matmuls of one phase with the VPU softmaxes of
        # another across heads. bf16 goes straight into the MXU (f32
        # accumulate via preferred_element_type); the softmax skips the
        # max-subtraction pass (logits clamped instead — exact for any sane
        # logit range) and folds the normalization into the (T, D) output
        # epilogue rather than the (T, T) probabilities. Measured 4.4 ->
        # 3.2 ms/layer at (320, 197, 12, 64).
        for f in range(frames):
            qf, kf, vf = q_ref[f], k_ref[f], v_ref[f]  # (T, H*D) bf16
            logits = [
                jax.lax.dot_general(
                    qf[:, head(h)], kf[:, head(h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ) * scale
                for h in range(heads)
            ]
            ps, sums = [], []
            for l in logits:
                p = _exp_probs(l)
                ps.append(p.astype(o_ref.dtype))
                sums.append(1.0 / jnp.sum(p, axis=-1, keepdims=True))  # (T, 1)
            for h in range(heads):
                o = jnp.dot(ps[h], vf[:, head(h)], preferred_element_type=jnp.float32)
                o_ref[f, :, head(h)] = (o * sums[h]).astype(o_ref.dtype)

    return kernel


def _make_encoder_qkv_kernel(heads: int, head_dim: int, frames: int):
    """Packed-qkv variant: one (T, 3·H·D) block per frame, [q | k | v]."""
    w = heads * head_dim

    def kernel(qkv_ref, o_ref):
        scale = head_dim ** -0.5

        def col(base, h):
            return slice(base + h * head_dim, base + (h + 1) * head_dim)

        for f in range(frames):
            xf = qkv_ref[f]  # (T, 3W) bf16
            logits = [
                jax.lax.dot_general(
                    xf[:, col(0, h)], xf[:, col(w, h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ) * scale
                for h in range(heads)
            ]
            ps, sums = [], []
            for l in logits:
                p = _exp_probs(l)
                ps.append(p.astype(o_ref.dtype))
                sums.append(1.0 / jnp.sum(p, axis=-1, keepdims=True))  # (T, 1)
            for h in range(heads):
                o = jnp.dot(ps[h], xf[:, col(2 * w, h)],
                            preferred_element_type=jnp.float32)
                o_ref[f, :, h * head_dim : (h + 1) * head_dim] = (
                    o * sums[h]
                ).astype(o_ref.dtype)

    return kernel


def fused_encoder_attention_qkv(qkv: jax.Array, heads: int, head_dim: int) -> jax.Array:
    """(N, T, 3·H·D) packed [q|k|v] -> (N, T, H·D); two frames per grid step
    (one for wide towers — at ViT-L geometry the (2, 257, 3072) qkv blocks
    plus 16 heads of (257, 257) f32 logits exceed the ~16 MB scoped VMEM)."""
    n, t, w3 = qkv.shape
    hd = heads * head_dim
    frames = 2 if n % 2 == 0 and hd <= 768 else 1

    return pl.pallas_call(
        _make_encoder_qkv_kernel(heads, head_dim, frames),
        out_shape=jax.ShapeDtypeStruct((n, t, hd), qkv.dtype),
        grid=(n // frames,),
        in_specs=[
            pl.BlockSpec((frames, t, w3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((frames, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(qkv)


def _quant_rows(y):
    """f32 (T, C) -> (int8 values, (T, 1) f32 scales): dynamic per-row
    absmax quantization for W8A8 GEMM inputs, entirely in VMEM.

    The scale divide happens on the (T, 1) reciprocal, not the (T, C)
    stream — VPU divides are multi-cycle, so `y * (127/s)` beats
    `y / s * 127` by a full-stream pass-equivalent per GEMM input. The
    clip is NOT redundant: |y| <= s gives |y·rs| <= 127 only up to the
    reciprocal's rounding, and an escaped 128 wraps to -128 in int8."""
    s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-8
    rs = 127.0 / s
    q = jnp.clip(jnp.round(y * rs), -127, 127).astype(jnp.int8)
    return q, s


def _w8a8_dot(yq, y_s, wq_ref, ws_ref):
    """int8 x int8 -> i32 -> f32 with per-row x per-channel dequant."""
    acc = jax.lax.dot_general(
        yq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (y_s / 127.0) * (ws_ref[...] / 127.0)


def quantize_weight(w):
    """fp32 (K, N) -> int8 weight + (1, N) f32 per-channel absmax scale.
    Weights are frozen, so this runs once per trace."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) + 1e-8
    return jnp.round(w / s * 127.0).astype(jnp.int8), s


def weight_q(p):
    """Quantized weight for a linear-param dict: the pre-quantized
    ("wq", "ws") leaves when present (clip_vit.prepare_int8_params — skips
    the in-graph absmax+round pass over the full f32 weight set, ~340 MB of
    HBM reads per flagship predict), else quantize at trace time."""
    if "wq" in p:
        return p["wq"], p["ws"]
    return quantize_weight(p["w"])


def _quant_kv_rows(rows):
    """(T', W) -> (int8 values, (T', 1) f32 scale); dequant = q · s.

    Row-wise absmax quantization for the int8 K/V export (op_mode
    kv_dtype="int8_rows"): halves the K/V HBM footprint END TO END — the
    encoder writes half the bytes and every decoder block reads half the
    bytes — unlike the per-(layer, head) kv_int8 capacity mode, which
    dequantizes at the consumer and rematerializes bf16 K/V."""
    r32 = rows.astype(jnp.float32)
    s = jnp.max(jnp.abs(r32), axis=-1, keepdims=True) * (1.0 / 127.0) + 1e-30
    q = jnp.clip(jnp.round(r32 * (1.0 / s)), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _attn_int8_cols(xf, heads, head_dim, scale, qk_only: bool = False,
                    kv_len: int | None = None):
    """Encoder self-attention for one frame's packed qkv (T, 3W) with the
    attention GEMMs on the int8 MXU (DFD_INT8_ATTN): Q and K per-(row, head)
    absmax-quantized, the exp'd probabilities per row, V per-channel-within-
    head. The dequant scales factor out of the contractions exactly
    (logits = (Qi Ki^T)·sq·sk^T, PV = (Pi Vi)·sp·sv); int8 rounding on the
    operands is the only approximation — gated end-to-end by the int8 AUROC
    tests. ``qk_only`` (DFD_INT8_ATTN=qk) keeps PV in bf16: the P
    quantization is the error-dominant half (per-row absmax over an exp'd
    distribution — small probabilities round to the quantum), while the
    logits GEMM errs pre-softmax where it is gentlest. ``kv_len`` masks key
    columns >= kv_len (the tower megakernel's 8-aligned token padding — pad
    rows must not contribute softmax mass). Returns the per-head (T, D) f32
    normalized outputs."""
    w = heads * head_dim
    t_pad = xf.shape[0]
    neg_cols = None
    if kv_len is not None and kv_len < t_pad:
        neg_cols = jax.lax.broadcasted_iota(
            jnp.int32, (1, t_pad), 1) >= kv_len

    def qrows(a):
        s = jnp.max(jnp.abs(a), axis=-1, keepdims=True) + 1e-8
        q = jnp.clip(jnp.round(a * (127.0 / s)), -127, 127).astype(jnp.int8)
        return q, s

    def col(base, h):
        return slice(base + h * head_dim, base + (h + 1) * head_dim)

    cols = []
    for h in range(heads):
        qf32 = xf[:, col(0, h)].astype(jnp.float32)
        kf32 = xf[:, col(w, h)].astype(jnp.float32)
        qi, sq = qrows(qf32)
        ki, sk = qrows(kf32)
        acc = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        lg = (acc.astype(jnp.float32)
              * (sq * (scale / (127.0 * 127.0))) * sk.T)
        if neg_cols is not None:
            # where (not add): a NaN/inf in a masked pad column must not
            # propagate through exp into the row's softmax sum
            lg = jnp.where(neg_cols, -1e30, lg)
        p = _exp_probs(lg)
        rsum = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        if qk_only:
            pv = jax.lax.dot_general(
                p.astype(xf.dtype), xf[:, col(2 * w, h)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cols.append(pv * rsum)
            continue
        pi, sp = qrows(p)
        vf32 = xf[:, col(2 * w, h)].astype(jnp.float32)
        sv = jnp.max(jnp.abs(vf32), axis=0, keepdims=True) + 1e-8
        vi = jnp.clip(jnp.round(vf32 * (127.0 / sv)),
                      -127, 127).astype(jnp.int8)
        pv = jax.lax.dot_general(
            pi, vi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        cols.append(pv.astype(jnp.float32)
                    * (sp * rsum / (127.0 * 127.0)) * sv)
    return cols


def _write_kv_export(refs, f, xf, w, drop_cls, stacked, kv_pad=0):
    """Write frame f's K/V rows (and scales on the int8_rows path) from the
    packed qkv stream xf (T, 3W). refs = (k, v, ks, vs); ks/vs None on the
    bf16 path.

    ``kv_pad`` appends that many ZERO rows per frame so the exported token
    axis is 8-row tile-aligned (196 -> 200 for CLIP-B): the consumer's
    (.., T, P, ..) -> (.., T*P, ..) token merge then compiles to a layout
    BITCAST instead of a materialized ~578 MB copy each for K and V
    (measured 2x 1.78 ms/batch at flagship shapes, PERF_r4 predict trace).
    Pad rows are masked as keys by the decoder (decoder.py patch_valid)."""
    k_ref, v_ref, ks_ref, vs_ref = refs
    lo = 1 if drop_cls else 0
    krows, vrows = xf[lo:, w : 2 * w], xf[lo:, 2 * w :]
    if ks_ref is not None:
        krows, ks = _quant_kv_rows(krows)
        vrows, vs = _quant_kv_rows(vrows)
        if kv_pad:
            ks = jnp.concatenate([ks, jnp.zeros((kv_pad, 1), ks.dtype)], 0)
            vs = jnp.concatenate([vs, jnp.zeros((kv_pad, 1), vs.dtype)], 0)
        ks_ref[f] = ks
        vs_ref[f] = vs
    if kv_pad:
        zpad = jnp.zeros((kv_pad, w), krows.dtype)
        krows = jnp.concatenate([krows, zpad], 0)
        vrows = jnp.concatenate([vrows, zpad], 0)
    if stacked:
        k_ref[0, f] = krows
        v_ref[0, f] = vrows
    else:
        k_ref[f] = krows
        v_ref[f] = vrows


def _make_attn_block_kernel(
    heads: int, head_dim: int, frames: int, export: bool, drop_cls: bool,
    last_only: bool, stacked: bool = False, skip_inputs: int = 0,
    int8_gemm: bool = False, kv_rows8: bool = False, kv_pad: int = 0,
):
    """Fused encoder block front half: LN1 + qkv GEMM + attention + out-proj
    + residual, with optional in-VMEM K/V export.

    ``last_only`` builds the export-only variant (the last kept layer's K/V
    depend only on ln_1 + qkv; no attention/out-proj runs and no h' is
    emitted — cf. clip_vit.clip_vision_kv's dead-work note). ``stacked``
    writes K/V into (1, frames, T', W) blocks of a (Lsel, N, T', W)
    accumulator instead of per-layer arrays (see fused_encoder_attn_block's
    export_into).
    """
    w = heads * head_dim

    def kernel(h_ref, wqkv_ref, *rest):
        if int8_gemm:
            (wqs_ref, bqkv_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
             *out_refs) = rest
        else:
            bqkv_ref, wo_ref, bo_ref, lns_ref, lnb_ref, *out_refs = rest
            wqs_ref = None
        scale = head_dim ** -0.5
        if skip_inputs:
            out_refs = out_refs[skip_inputs:]  # aliased accumulator INPUT refs
        ks_ref = vs_ref = None
        if last_only:
            k_ref, v_ref = out_refs[:2]
            ho_ref = None
            if kv_rows8:
                ks_ref, vs_ref = out_refs[2:4]
        elif export:
            ho_ref, k_ref, v_ref = out_refs[:3]
            if kv_rows8:
                ks_ref, vs_ref = out_refs[3:5]
        else:
            ho_ref = out_refs[0]
            k_ref = v_ref = None

        def col(base, h):
            return slice(base + h * head_dim, base + (h + 1) * head_dim)

        for f in range(frames):
            hf = h_ref[f]  # (T, W) bf16
            # LayerNorm in f32 (layers.layer_norm semantics).
            x32 = hf.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * lns_ref[...] + lnb_ref[...]
            if int8_gemm:
                # W8A8 qkv: the LN output quantizes in-VMEM (free), the
                # int8 MXU runs ~1.5x the bf16 rate at this shape (PERF.md)
                yq, y_s = _quant_rows(y)
                qkv = _w8a8_dot(yq, y_s, wqkv_ref, wqs_ref) + bqkv_ref[...]
            else:
                # qkv projection on the MXU, f32 accumulate, bias -> bf16.
                qkv = jax.lax.dot_general(
                    y.astype(h_ref.dtype), wqkv_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bqkv_ref[...]
            xf = qkv.astype(h_ref.dtype)  # (T, 3W)
            if k_ref is not None:
                _write_kv_export((k_ref, v_ref, ks_ref, vs_ref), f, xf, w,
                                 drop_cls, stacked, kv_pad)
            if last_only:
                continue
            logits = [
                jax.lax.dot_general(
                    xf[:, col(0, h)], xf[:, col(w, h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ) * scale
                for h in range(heads)
            ]
            ps, sums = [], []
            for l in logits:
                p = _exp_probs(l)
                ps.append(p.astype(h_ref.dtype))
                sums.append(1.0 / jnp.sum(p, axis=-1, keepdims=True))  # (T, 1)
            cols = []
            for h in range(heads):
                o = jnp.dot(ps[h], xf[:, col(2 * w, h)],
                            preferred_element_type=jnp.float32)
                cols.append(o * sums[h])
            attn = jnp.concatenate(cols, axis=-1).astype(h_ref.dtype)  # (T, W)
            out = jax.lax.dot_general(
                attn, wo_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bo_ref[...]
            ho_ref[f] = hf + out.astype(h_ref.dtype)

    return kernel


def fused_encoder_attn_block(
    h: jax.Array,
    ln: dict,
    attn: dict,
    heads: int,
    head_dim: int,
    *,
    export: bool = False,
    drop_cls: bool = False,
    last_only: bool = False,
    export_into=None,
    int8_gemm: bool = False,
    kv_rows8: bool = False,
    kv_pad: int = 0,
):
    """One fused call for the encoder block's attention half.

    h: (N, T, W) bf16 residual stream. ln: {"scale","bias"} fp32 (W,).
    attn: {"in_proj": {"w","b"}, "out_proj": {"w","b"}} fp32 params.

    Returns ``h_out`` — or ``(h_out, k, v)`` with k/v (N, T', H, D) bf16 when
    ``export`` (T' = T-1 under ``drop_cls``) — or just ``(k, v)`` when
    ``last_only``. Fusing keeps the (N, T, 3W) qkv stream entirely in VMEM:
    the unfused XLA program writes it to HBM after the GEMM and re-reads it
    for the attention custom-call (~0.6 GB of round-trips per flagship layer,
    PERF.md).
    """
    n, t, w = h.shape
    assert w == heads * head_dim
    # Frames per grid step: larger steps raise the qkv GEMM's M (197·frames)
    # toward full MXU efficiency at the cost of VMEM; 4 measured best at
    # ViT-B flagship shapes (DFD_FUSED_FRAMES overrides for experiments).
    # Wide towers (ViT-L: 257 tokens, 16 heads) halve it — the per-frame
    # logits alone are 4.2 MB f32 there.
    import os

    frames = int(os.environ.get("DFD_FUSED_FRAMES", "4" if w <= 768 else "2"))
    while frames > 1 and n % frames:
        frames //= 2
    t_out = (t - 1 if drop_cls else t) + kv_pad  # export rows (8-aligned pad)
    dt = h.dtype

    bqkv = attn["in_proj"]["b"].astype(jnp.float32).reshape(1, 3 * w)
    wo = attn["out_proj"]["w"].astype(dt)
    bo = attn["out_proj"]["b"].astype(jnp.float32).reshape(1, w)
    lns = ln["scale"].astype(jnp.float32).reshape(1, w)
    lnb = ln["bias"].astype(jnp.float32).reshape(1, w)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blocked = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)

    stacked = export_into is not None
    if int8_gemm:
        wqkv, wqs = weight_q(attn["in_proj"])
        in_specs = [
            blocked((frames, t, w)),
            const((w, 3 * w)), const((1, 3 * w)), const((1, 3 * w)),
            const((w, w)), const((1, w)),
            const((1, w)), const((1, w)),
        ]
        inputs = [h, wqkv, wqs, bqkv, wo, bo, lns, lnb]
    else:
        wqkv = attn["in_proj"]["w"].astype(dt)
        in_specs = [
            blocked((frames, t, w)),
            const((w, 3 * w)), const((1, 3 * w)),
            const((w, w)), const((1, w)),
            const((1, w)), const((1, w)),
        ]
        inputs = [h, wqkv, bqkv, wo, bo, lns, lnb]
    aliases = {}

    kv_dt = jnp.int8 if kv_rows8 else dt
    out_shapes, out_specs = [], []
    if not last_only:
        out_shapes.append(jax.ShapeDtypeStruct((n, t, w), dt))
        out_specs.append(blocked((frames, t, w)))
    if export or last_only:
        if stacked:
            # Write this layer's K/V straight into slot `slot` of the
            # (Lsel, N, T', W) accumulators: the per-layer arrays and the
            # downstream jnp.stack copy (~2x the full K/V footprint in HBM
            # round-trips) never exist. The accumulator inputs are aliased
            # to the outputs — in-place, no defensive copy, because each
            # accumulator version is dead after this call.
            kacc, vacc, slot, nsel = export_into
            kv_block = pl.BlockSpec(
                (1, frames, t_out, w),
                lambda i, _slot=slot: (_slot, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for acc in (kacc, vacc):
                # the kernel never READS the aliased accumulator input — ANY
                # keeps it out of VMEM (only output blocks staged); aliasing
                # also keeps Mosaic's in-place output handling, which a
                # fresh (non-aliased) stacked output would lose (measured:
                # VMEM OOM at frames=4 without the alias). acc=None
                # (DFD_FRESH_ACC, first kept layer) emits the accumulator as
                # a FRESH output — other slots are uninitialized until their
                # layer's aliased call writes them, skipping the caller's
                # zero-init pass over the full K/V footprint (~2 ms/batch).
                if acc is not None:
                    aliases[len(inputs)] = len(out_shapes)
                    inputs.append(acc)
                    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
                out_shapes.append(jax.ShapeDtypeStruct((nsel, n, t_out, w), kv_dt))
                out_specs.append(kv_block)
        else:
            for _ in ("k", "v"):
                out_shapes.append(jax.ShapeDtypeStruct((n, t_out, w), kv_dt))
                out_specs.append(blocked((frames, t_out, w)))
        if kv_rows8:
            # per-row dequant scales: tiny (N, T', 1) f32 per-layer outputs
            # (never stacked/aliased — the caller stacks ~1.5 MB total)
            for _ in ("ks", "vs"):
                out_shapes.append(jax.ShapeDtypeStruct((n, t_out, 1), jnp.float32))
                out_specs.append(blocked((frames, t_out, 1)))

    outs = pl.pallas_call(
        _make_attn_block_kernel(heads, head_dim, frames, export, drop_cls,
                                last_only, stacked=stacked,
                                skip_inputs=len(aliases),
                                int8_gemm=int8_gemm, kv_rows8=kv_rows8,
                                kv_pad=kv_pad),
        out_shape=tuple(out_shapes),
        grid=(n // frames,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases=aliases,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*inputs)

    def split_kv(kf, vf):
        if stacked:
            return kf, vf  # (Lsel, N, T', W) accumulators
        return (kf.reshape(n, t_out, heads, head_dim),
                vf.reshape(n, t_out, heads, head_dim))

    if last_only:
        if kv_rows8:
            return (*split_kv(outs[0], outs[1]), outs[2], outs[3])
        return split_kv(*outs)
    if export:
        if kv_rows8:
            return outs[0], *split_kv(outs[1], outs[2]), outs[3], outs[4]
        return outs[0], *split_kv(outs[1], outs[2])
    return outs[0]


def _make_full_block_kernel_phased(
    heads: int, head_dim: int, frames: int, export: bool, drop_cls: bool,
    stacked: bool = False, skip_inputs: int = 0, int8_gemm: bool = False,
    int8_wo: bool = False, kv_rows8: bool = False, mode: str = "full",
    int8_attn: str = "0", kv_pad: int = 0,
):
    """Phase-major variant of the whole-block kernel (DFD_PHASE_MAJOR).

    The frame-major kernel emits each frame as one long dependency chain, so
    the VPU stages (LN, quant/dequant, softmax exp, QuickGELU — ~1.5 ms/layer
    of vector work at flagship shapes) serialize against the MXU GEMMs.
    Emitting stage-by-stage across ALL frames in the grid step instead gives
    Mosaic's scheduler independent chains to interleave: frame f's GEMM can
    run under frame f+1's LN/quant. Same math, same operands, same outputs —
    program order is the only difference (the attention kernel's per-head
    phase separation measured 4.4 -> 3.2 ms/layer the same way).

    ``mode="full"`` phases every stage — maximal ILP, but the doubled live
    ranges push Mosaic past the ~16 MB scoped VMEM at frames>=2 (compile
    fails on v5e at flagship shapes). ``mode="mlp"`` keeps the attention
    half frame-major and phases only the MLP half, where most of the vector
    work lives (GELU + two quants + LN2 ~ 11M of the ~18M VPU ops/frame):
    the attention intermediates are dead by then, so only the two (T, 4W)
    f32 MLP streams coexist."""
    import os

    w = heads * head_dim
    # DFD_ABLATE (perf attribution ONLY — changes the math): comma list of
    # stages to skip so tools/bench_r3_ladder.py's "ablate" ladder can
    # itemize the in-kernel non-GEMM time on chip. Stages: ln (skip the
    # normalization, keep scale+shift), scale (constant quant scale — skips
    # the per-row absmax reduce), quant (skip round/clip/scale entirely),
    # dequant (skip the output scale mults), exp (probs = raw logits),
    # norm (skip the softmax row-sum normalization), attn (bypass
    # logits/softmax/PV — out-proj consumes the q slice), gelu (skip the
    # QuickGELU sigmoid·x). Applied only on this phased path.
    ablate = frozenset(filter(None, os.environ.get("DFD_ABLATE", "").split(",")))
    # DFD_GELU_BF16: run the QuickGELU sigmoid·x in bf16 (the f32 pass
    # ablated at 3.7 ms/batch across the 11 flagship block kernels). The
    # GELU output feeds a per-row absmax quant — bf16's ~3 decimal digits
    # bound the extra relative step error at ~2^-8, inside the int8
    # quantizer's own 2^-7 quantum (gated end-to-end by the AUROC tests).
    gelu_bf16 = os.environ.get("DFD_GELU_BF16", "0") == "1"
    # DFD_KT_LOGITS: the ablation ladder priced the per-head QK^T logits
    # GEMMs at 7.4 ms/batch while the same-sized PV GEMMs are free — the
    # logits dot contracts dim 1 of BOTH operands, so Mosaic transposes the
    # (T, D) k slice per head per frame; PV contracts lhs-1 x rhs-0, the
    # MXU-native layout. This knob transposes each frame's packed k block
    # ONCE ((T, W) -> (W, T), one relayout instead of `heads`), folds the
    # 1/sqrt(D) scale into the transposed k (0.125 = 2^-3: an exponent
    # shift, EXACT in bf16), and runs native-layout (T, D)x(D, T) logits
    # GEMMs on 64-row sublane slices.
    kt_logits = os.environ.get("DFD_KT_LOGITS", "0") == "1"
    # DFD_ONESCOL: append a ones column to each PV GEMM's v operand so the
    # softmax row-sums come out of the MXU epilogue for free (D=64 pads to
    # the 128-lane tile regardless) instead of a VPU row-reduce over every
    # (T, T) probability tile (ablation: 1.3 ms/batch).
    ones_col_sums = os.environ.get("DFD_ONESCOL", "0") == "1"

    def qgelu(m):
        if "gelu" in ablate:
            return m
        if gelu_bf16:
            # sigmoid's exp+divide in bf16 halves the VPU stream; the
            # 1.702·m mul stays f32 (a bf16 scalar broadcast trips a Mosaic
            # verifier error on v5e as of jax 0.8.x)
            s16 = jax.nn.sigmoid((1.702 * m).astype(jnp.bfloat16))
            return m * s16.astype(jnp.float32)
        return m * jax.nn.sigmoid(1.702 * m)

    def kernel(h_ref, *rest):
        if int8_gemm:
            (wqkv_ref, wqs_ref, bqkv_ref, wo_ref, wos_ref, bo_ref,
             ln1s_ref, ln1b_ref,
             wfc_ref, wfcs_ref, bfc_ref, wproj_ref, wprojs_ref, bproj_ref,
             ln2s_ref, ln2b_ref, *out_refs) = rest
        else:
            (wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
             wfc_ref, bfc_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
             *out_refs) = rest
            wqs_ref = wfcs_ref = wprojs_ref = wos_ref = None
        scale = head_dim ** -0.5
        if skip_inputs:
            out_refs = out_refs[skip_inputs:]
        ks_ref = vs_ref = None
        if export:
            ho_ref, k_ref, v_ref = out_refs[:3]
            if kv_rows8:
                ks_ref, vs_ref = out_refs[3:5]
        else:
            ho_ref = out_refs[0]
            k_ref = v_ref = None

        def col(base, h):
            return slice(base + h * head_dim, base + (h + 1) * head_dim)

        def ln(x32, s_ref, b_ref):
            if "ln" in ablate:
                return x32 * s_ref[...] + b_ref[...]
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            return (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * s_ref[...] + b_ref[...]

        def quant(y32):
            if "quant" in ablate:
                return y32.astype(jnp.int8), jnp.float32(127.0)
            if "scale" in ablate:
                return (jnp.clip(jnp.round(y32), -127, 127).astype(jnp.int8),
                        jnp.float32(127.0))
            return _quant_rows(y32)

        def w8a8(yq, y_s, w_ref, ws_ref):
            if "dequant" in ablate:
                acc = jax.lax.dot_general(
                    yq, w_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc.astype(jnp.float32)
            return _w8a8_dot(yq, y_s, w_ref, ws_ref)

        def gemm(y32, w_ref, ws_ref, b_ref):
            if int8_gemm:
                yq, y_s = quant(y32)
                return w8a8(yq, y_s, w_ref, ws_ref) + b_ref[...]
            return jax.lax.dot_general(
                y32.astype(h_ref.dtype), w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b_ref[...]

        def oproj(attn32):
            if int8_wo:
                aq, a_s = quant(attn32)
                return w8a8(aq, a_s, wo_ref, wos_ref) + bo_ref[...]
            return jax.lax.dot_general(
                attn32.astype(h_ref.dtype), wo_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ) + bo_ref[...]

        def attend(f, xf):
            """logits -> softmax -> mix -> out-proj -> residual for frame f."""
            if int8_attn != "0":
                cols = _attn_int8_cols(xf, heads, head_dim, scale,
                                       qk_only=int8_attn == "qk")
                return hfs[f].astype(jnp.float32) + oproj(
                    jnp.concatenate(cols, axis=-1))
            logits = [
                jax.lax.dot_general(
                    xf[:, col(0, h)], xf[:, col(w, h)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                for h in range(heads)
            ]
            ps, sums = [], []
            for l in logits:
                p = _exp_probs(l)
                ps.append(p.astype(h_ref.dtype))
                sums.append(1.0 / jnp.sum(p, axis=-1, keepdims=True))
            cols = [
                jnp.dot(ps[h], xf[:, col(2 * w, h)],
                        preferred_element_type=jnp.float32) * sums[h]
                for h in range(heads)
            ]
            return hfs[f].astype(jnp.float32) + oproj(
                jnp.concatenate(cols, axis=-1))

        hfs = [h_ref[f] for f in range(frames)]
        if mode == "rows":
            # Batched-M: LN + GEMMs run on the (frames*T, ·) row-merged
            # block — M=197 pads to 224 on the MXU (~14% waste) while
            # M=frames*197 pads by <2%; one GEMM per stage instead of
            # `frames`. Attention stays per-frame (the (T, T) logits don't
            # row-merge). Same math: LN and GEMMs are per-row ops.
            t_rows = h_ref.shape[1]
            hall = jnp.reshape(h_ref[...], (frames * t_rows, w))
            y = ln(hall.astype(jnp.float32), ln1s_ref, ln1b_ref)
            xall = gemm(y, wqkv_ref, wqs_ref, bqkv_ref).astype(h_ref.dtype)
            if k_ref is not None:
                for f in range(frames):
                    _write_kv_export(
                        (k_ref, v_ref, ks_ref, vs_ref), f,
                        xall[f * t_rows : (f + 1) * t_rows], w, drop_cls,
                        stacked, kv_pad)
            hmids = [attend(f, xall[f * t_rows : (f + 1) * t_rows])
                     for f in range(frames)]
            hmid_all = jnp.concatenate(hmids, axis=0)  # (F*T, W) f32
            y2 = ln(hmid_all, ln2s_ref, ln2b_ref)
            mid = qgelu(gemm(y2, wfc_ref, wfcs_ref, bfc_ref))
            out2 = gemm(mid, wproj_ref, wprojs_ref, bproj_ref)
            ho_ref[...] = jnp.reshape(
                (hmid_all + out2).astype(ho_ref.dtype), (frames, t_rows, w))
            return
        if mode in ("fr", "frm"):
            # merged-M GEMMs (the "rows" win: M=F*197 pads ~5.6% vs ~13.7%
            # at M=197) WITHOUT "rows"' frame-major attention (its loss —
            # attend() serializes each frame's VPU softmax against its MXU
            # issues; here the attention phases interleave across frames
            # exactly as in mode="full").
            t_rows = h_ref.shape[1]
            hall = jnp.reshape(h_ref[...], (frames * t_rows, w))
            y = ln(hall.astype(jnp.float32), ln1s_ref, ln1b_ref)
            xall = gemm(y, wqkv_ref, wqs_ref, bqkv_ref).astype(h_ref.dtype)
            xfs = [xall[f * t_rows : (f + 1) * t_rows] for f in range(frames)]
            if k_ref is not None:
                for f, xf in enumerate(xfs):
                    _write_kv_export((k_ref, v_ref, ks_ref, vs_ref), f, xf,
                                     w, drop_cls, stacked, kv_pad)
            if mode == "frm":
                # MERGED-frame attention (round-5, after the ablation ladder
                # priced the per-frame path at 9.8 ms/batch): the per-frame
                # kernels issue frames*heads tiny (T, D, T) logits/PV GEMM
                # pairs per grid step, each pipeline-overhead-bound on the
                # MXU. Here each head runs ONE (F·T, F·T) logits GEMM with
                # the cross-frame quadrants masked after exp (2x the MACs of
                # the per-frame pair, but MACs are 4% of the kernel's FLOPs
                # — fewer, larger GEMMs win). The PV GEMM carries an extra
                # ones-column so the softmax row-sums fall out of the MXU
                # for free (D=64 pads to the 128-lane tile either way),
                # replacing the VPU row-sum reduce (its ablation: 1.3 ms).
                ell = frames * t_rows
                blockdiag = (
                    jax.lax.broadcasted_iota(jnp.int32, (ell, ell), 0)
                    // t_rows
                    == jax.lax.broadcasted_iota(jnp.int32, (ell, ell), 1)
                    // t_rows)
                ones_col = jnp.ones((ell, 1), h_ref.dtype)
                lgs = [
                    jax.lax.dot_general(
                        xall[:, col(0, h)], xall[:, col(w, h)],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    for h in range(heads)
                ]
                pms = [jnp.where(blockdiag, _exp_probs(lg), 0.0).astype(
                    h_ref.dtype) for lg in lgs]
                cols = []
                for h in range(heads):
                    vp = jnp.concatenate(
                        [xall[:, col(2 * w, h)], ones_col], axis=1)
                    pv = jax.lax.dot_general(
                        pms[h], vp, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (L, D+1)
                    cols.append(pv[:, :head_dim]
                                * (1.0 / pv[:, head_dim:]))
                hmid_all = hall.astype(jnp.float32) + oproj(
                    jnp.concatenate(cols, axis=-1))
                y2 = ln(hmid_all, ln2s_ref, ln2b_ref)
                mid = qgelu(gemm(y2, wfc_ref, wfcs_ref, bfc_ref))
                out2 = gemm(mid, wproj_ref, wprojs_ref, bproj_ref)
                ho_ref[...] = jnp.reshape(
                    (hmid_all + out2).astype(ho_ref.dtype),
                    (frames, t_rows, w))
                return
            logits = [
                [jax.lax.dot_general(
                    xf[:, col(0, h)], xf[:, col(w, h)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale for h in range(heads)]
                for xf in xfs
            ]
            ps = [[None] * heads for _ in range(frames)]
            sums = [[None] * heads for _ in range(frames)]
            for f in range(frames):
                for h in range(heads):
                    p = _exp_probs(logits[f][h])
                    ps[f][h] = p.astype(h_ref.dtype)
                    sums[f][h] = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            attns = []
            for f, xf in enumerate(xfs):
                cols = [
                    jnp.dot(ps[f][h], xf[:, col(2 * w, h)],
                            preferred_element_type=jnp.float32) * sums[f][h]
                    for h in range(heads)
                ]
                attns.append(jnp.concatenate(cols, axis=-1))
            hmid_all = jnp.reshape(h_ref[...], (frames * t_rows, w)).astype(
                jnp.float32) + oproj(jnp.concatenate(attns, axis=0))
            y2 = ln(hmid_all, ln2s_ref, ln2b_ref)
            mid = qgelu(gemm(y2, wfc_ref, wfcs_ref, bfc_ref))
            out2 = gemm(mid, wproj_ref, wprojs_ref, bproj_ref)
            ho_ref[...] = jnp.reshape(
                (hmid_all + out2).astype(ho_ref.dtype), (frames, t_rows, w))
            return
        if mode == "full":
            # LN1 (VPU) -> qkv GEMM (MXU), frame-interleaved
            ys = [ln(hf.astype(jnp.float32), ln1s_ref, ln1b_ref) for hf in hfs]
            xfs = [gemm(y, wqkv_ref, wqs_ref, bqkv_ref).astype(h_ref.dtype)
                   for y in ys]
        else:
            xfs = [gemm(ln(hf.astype(jnp.float32), ln1s_ref, ln1b_ref),
                        wqkv_ref, wqs_ref, bqkv_ref).astype(h_ref.dtype)
                   for hf in hfs]
        if k_ref is not None:
            for f, xf in enumerate(xfs):
                _write_kv_export((k_ref, v_ref, ks_ref, vs_ref), f, xf, w,
                                 drop_cls, stacked, kv_pad)
        if "attn" in ablate:
            hmids = [
                hfs[f].astype(jnp.float32)
                + oproj(xf[:, :w].astype(jnp.float32))
                for f, xf in enumerate(xfs)
            ]
        elif int8_attn != "0" and mode in ("full", "attn"):
            hmids = [
                hfs[f].astype(jnp.float32) + oproj(jnp.concatenate(
                    _attn_int8_cols(xf, heads, head_dim, scale,
                                    qk_only=int8_attn == "qk"), axis=-1))
                for f, xf in enumerate(xfs)
            ]
        elif mode in ("full", "attn"):
            # attention: logits (MXU) / exp (VPU) / mix (MXU) phases span
            # frames x heads
            if "logitsgemm" in ablate:
                t_rows = h_ref.shape[1]
                logits = [[xf[:, :t_rows].astype(jnp.float32)
                           for _ in range(heads)] for xf in xfs]
            elif kt_logits:
                # one (T, W) -> (W, T) relayout per frame (scale folded in,
                # exact: 2^-int exponent shift), then MXU-native NN GEMMs
                # on 64-row sublane slices of k^T
                kts = [jnp.transpose(xf[:, w : 2 * w]) * scale for xf in xfs]
                logits = [
                    [jax.lax.dot_general(
                        xf[:, col(0, h)],
                        kts[f][h * head_dim : (h + 1) * head_dim, :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) for h in range(heads)]
                    for f, xf in enumerate(xfs)
                ]
            else:
                logits = [
                    [jax.lax.dot_general(
                        xf[:, col(0, h)], xf[:, col(w, h)],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * scale for h in range(heads)]
                    for xf in xfs
                ]
            ps = [[None] * heads for _ in range(frames)]
            sums = [[None] * heads for _ in range(frames)]
            for f in range(frames):
                for h in range(heads):
                    p = logits[f][h] if "exp" in ablate else _exp_probs(
                        logits[f][h])
                    ps[f][h] = p.astype(h_ref.dtype)
                    if not ones_col_sums:
                        sums[f][h] = (jnp.float32(1.0) if "norm" in ablate
                                      else 1.0 / jnp.sum(p, axis=-1,
                                                         keepdims=True))
            attns = []
            for f, xf in enumerate(xfs):
                if "pvgemm" in ablate:
                    cols = [ps[f][h][:, :head_dim].astype(jnp.float32)
                            * (1.0 if ones_col_sums else sums[f][h])
                            for h in range(heads)]
                elif ones_col_sums:
                    # v carries a ones column: pv[:, D] = the softmax row
                    # sum, straight off the MXU (see DFD_ONESCOL above)
                    ones_c = jnp.ones((xf.shape[0], 1), h_ref.dtype)
                    cols = []
                    for h in range(heads):
                        vp = jnp.concatenate(
                            [xf[:, col(2 * w, h)], ones_c], axis=1)
                        pv = jnp.dot(ps[f][h], vp,
                                     preferred_element_type=jnp.float32)
                        cols.append(pv[:, :head_dim]
                                    * (1.0 / pv[:, head_dim:]))
                else:
                    cols = [
                        jnp.dot(ps[f][h], xf[:, col(2 * w, h)],
                                preferred_element_type=jnp.float32) * sums[f][h]
                        for h in range(heads)
                    ]
                attns.append(jnp.concatenate(cols, axis=-1))
            hmids = [
                hfs[f].astype(jnp.float32) + oproj(attns[f])
                for f in range(frames)
            ]
        else:
            # frame-major attention: frame f's intermediates die before
            # frame f+1 starts (VMEM), only hmid (T, W) f32 survives
            hmids = [attend(f, xf) for f, xf in enumerate(xfs)]
        # MLP half, frame-interleaved
        y2s = [ln(hm, ln2s_ref, ln2b_ref) for hm in hmids]
        mids = [qgelu(gemm(y2, wfc_ref, wfcs_ref, bfc_ref)) for y2 in y2s]
        for f in range(frames):
            out2 = gemm(mids[f], wproj_ref, wprojs_ref, bproj_ref)
            ho_ref[f] = (hmids[f] + out2).astype(ho_ref.dtype)

    return kernel


def _make_full_block_kernel(
    heads: int, head_dim: int, frames: int, export: bool, drop_cls: bool,
    stacked: bool = False, skip_inputs: int = 0, int8_gemm: bool = False,
    int8_wo: bool = False, kv_rows8: bool = False, kv_pad: int = 0,
):
    """WHOLE encoder block in one kernel: LN1 + qkv + attention + out-proj +
    residual + LN2 + c_fc + QuickGELU + c_proj + residual (+ K/V export).

    vs the split attn/MLP kernel pair this removes one full HBM round-trip of
    the residual stream per layer (the intermediate h' between the halves,
    ~0.3 ms/layer at flagship shapes) and halves the kernel count. The price
    is VMEM: all four GEMM weight sets resident at once — 14.1 MB bf16 at
    w=768 (fits only at small frames/grid-step), 7.7 MB with int8 weights.
    Selection is empirical via DFD_FUSED_BLOCK (see fused_encoder_block).
    """
    w = heads * head_dim

    def kernel(h_ref, *rest):
        if int8_gemm:
            (wqkv_ref, wqs_ref, bqkv_ref, wo_ref, wos_ref, bo_ref,
             ln1s_ref, ln1b_ref,
             wfc_ref, wfcs_ref, bfc_ref, wproj_ref, wprojs_ref, bproj_ref,
             ln2s_ref, ln2b_ref, *out_refs) = rest
        else:
            (wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
             wfc_ref, bfc_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
             *out_refs) = rest
            wqs_ref = wfcs_ref = wprojs_ref = wos_ref = None
        scale = head_dim ** -0.5
        if skip_inputs:
            out_refs = out_refs[skip_inputs:]  # aliased accumulator INPUT refs
        ks_ref = vs_ref = None
        if export:
            ho_ref, k_ref, v_ref = out_refs[:3]
            if kv_rows8:
                ks_ref, vs_ref = out_refs[3:5]
        else:
            ho_ref = out_refs[0]
            k_ref = v_ref = None

        def col(base, h):
            return slice(base + h * head_dim, base + (h + 1) * head_dim)

        def ln(x32, s_ref, b_ref):
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            return (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * s_ref[...] + b_ref[...]

        for f in range(frames):
            hf = h_ref[f]  # (T, W) bf16
            y = ln(hf.astype(jnp.float32), ln1s_ref, ln1b_ref)
            if int8_gemm:
                yq, y_s = _quant_rows(y)
                qkv = _w8a8_dot(yq, y_s, wqkv_ref, wqs_ref) + bqkv_ref[...]
            else:
                qkv = jax.lax.dot_general(
                    y.astype(h_ref.dtype), wqkv_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bqkv_ref[...]
            xf = qkv.astype(h_ref.dtype)  # (T, 3W)
            if k_ref is not None:
                _write_kv_export((k_ref, v_ref, ks_ref, vs_ref), f, xf, w,
                                 drop_cls, stacked, kv_pad)
            logits = [
                jax.lax.dot_general(
                    xf[:, col(0, h)], xf[:, col(w, h)],
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
                ) * scale
                for h in range(heads)
            ]
            ps, sums = [], []
            for l in logits:
                p = _exp_probs(l)
                ps.append(p.astype(h_ref.dtype))
                sums.append(1.0 / jnp.sum(p, axis=-1, keepdims=True))  # (T, 1)
            cols = []
            for h in range(heads):
                o = jnp.dot(ps[h], xf[:, col(2 * w, h)],
                            preferred_element_type=jnp.float32)
                cols.append(o * sums[h])
            attn32 = jnp.concatenate(cols, axis=-1)  # (T, W) f32
            if int8_wo:
                aq, a_s = _quant_rows(attn32)
                out = _w8a8_dot(aq, a_s, wo_ref, wos_ref) + bo_ref[...]
            else:
                out = jax.lax.dot_general(
                    attn32.astype(h_ref.dtype), wo_ref[...],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ) + bo_ref[...]
            hmid32 = hf.astype(jnp.float32) + out  # residual, f32
            # ---- MLP half, h' never leaves VMEM ----
            y2 = ln(hmid32, ln2s_ref, ln2b_ref)
            if int8_gemm:
                y2q, y2_s = _quant_rows(y2)
                mid = _w8a8_dot(y2q, y2_s, wfc_ref, wfcs_ref) + bfc_ref[...]
            else:
                mid = jax.lax.dot_general(
                    y2.astype(h_ref.dtype), wfc_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bfc_ref[...]
            mid = mid * jax.nn.sigmoid(1.702 * mid)  # QuickGELU, f32
            if int8_gemm:
                mq, m_s = _quant_rows(mid)
                out2 = _w8a8_dot(mq, m_s, wproj_ref, wprojs_ref) + bproj_ref[...]
            else:
                out2 = jax.lax.dot_general(
                    mid.astype(h_ref.dtype), wproj_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bproj_ref[...]
            ho_ref[f] = (hmid32 + out2).astype(ho_ref.dtype)

    return kernel


def fused_encoder_block(
    h: jax.Array,
    ln1: dict,
    attn: dict,
    ln2: dict,
    mlp: dict,
    heads: int,
    head_dim: int,
    *,
    export: bool = False,
    drop_cls: bool = False,
    export_into=None,
    int8_gemm: bool = False,
    kv_rows8: bool = False,
    kv_pad: int = 0,
):
    """One fused call for the ENTIRE encoder block (attention + MLP halves),
    optionally exporting this layer's K/V. Same contract as
    fused_encoder_attn_block(export=...) followed by fused_encoder_mlp_block,
    in one Pallas call (see _make_full_block_kernel for the trade).
    """
    import os

    n, t, w = h.shape
    assert w == heads * head_dim
    hidden = mlp["c_fc"]["w"].shape[1]
    frames = int(os.environ.get("DFD_BLOCK_FRAMES", "2"))
    while frames > 1 and n % frames:
        frames //= 2
    t_out = (t - 1 if drop_cls else t) + kv_pad  # export rows (8-aligned pad)
    dt = h.dtype

    bqkv = attn["in_proj"]["b"].astype(jnp.float32).reshape(1, 3 * w)
    wo = attn["out_proj"]["w"].astype(dt)
    bo = attn["out_proj"]["b"].astype(jnp.float32).reshape(1, w)
    ln1s = ln1["scale"].astype(jnp.float32).reshape(1, w)
    ln1b = ln1["bias"].astype(jnp.float32).reshape(1, w)
    bfc = mlp["c_fc"]["b"].astype(jnp.float32).reshape(1, hidden)
    bproj = mlp["c_proj"]["b"].astype(jnp.float32).reshape(1, w)
    ln2s = ln2["scale"].astype(jnp.float32).reshape(1, w)
    ln2b = ln2["bias"].astype(jnp.float32).reshape(1, w)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blocked = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM)

    stacked = export_into is not None
    # on the int8 path the attention out-proj GEMM also runs W8A8 by default
    # (DFD_INT8_WO=0 keeps it bf16): +~0.1 ms/layer of int8-MXU rate on an
    # approximate path whose drift is already gated end-to-end
    # (tests/test_int8_e2e.py, scripts/validate_parity.py).
    int8_wo = int8_gemm and os.environ.get("DFD_INT8_WO", "1") == "1"
    if int8_gemm:
        wqkv, wqs = weight_q(attn["in_proj"])
        wfc, wfcs = weight_q(mlp["c_fc"])
        wproj, wprojs = weight_q(mlp["c_proj"])
        if int8_wo:
            wo, wos = weight_q(attn["out_proj"])
        else:
            wos = jnp.zeros((1, w), jnp.float32)  # unused dummy
        inputs = [h, wqkv, wqs, bqkv, wo, wos, bo, ln1s, ln1b,
                  wfc, wfcs, bfc, wproj, wprojs, bproj, ln2s, ln2b]
        in_specs = [
            blocked((frames, t, w)),
            const((w, 3 * w)), const((1, 3 * w)), const((1, 3 * w)),
            const((w, w)), const((1, w)), const((1, w)), const((1, w)), const((1, w)),
            const((w, hidden)), const((1, hidden)), const((1, hidden)),
            const((hidden, w)), const((1, w)), const((1, w)),
            const((1, w)), const((1, w)),
        ]
    else:
        wqkv = attn["in_proj"]["w"].astype(dt)
        wfc = mlp["c_fc"]["w"].astype(dt)
        wproj = mlp["c_proj"]["w"].astype(dt)
        inputs = [h, wqkv, bqkv, wo, bo, ln1s, ln1b,
                  wfc, bfc, wproj, bproj, ln2s, ln2b]
        in_specs = [
            blocked((frames, t, w)),
            const((w, 3 * w)), const((1, 3 * w)),
            const((w, w)), const((1, w)), const((1, w)), const((1, w)),
            const((w, hidden)), const((1, hidden)),
            const((hidden, w)), const((1, w)),
            const((1, w)), const((1, w)),
        ]
    aliases = {}

    kv_dt = jnp.int8 if kv_rows8 else dt
    out_shapes = [jax.ShapeDtypeStruct((n, t, w), dt)]
    out_specs = [blocked((frames, t, w))]
    if export:
        if stacked:
            kacc, vacc, slot, nsel = export_into
            kv_block = pl.BlockSpec(
                (1, frames, t_out, w),
                lambda i, _slot=slot: (_slot, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for acc in (kacc, vacc):
                # same in-place stacked-export scheme as
                # fused_encoder_attn_block (ANY-space aliased input;
                # acc=None emits a fresh accumulator — DFD_FRESH_ACC)
                if acc is not None:
                    aliases[len(inputs)] = len(out_shapes)
                    inputs.append(acc)
                    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
                out_shapes.append(jax.ShapeDtypeStruct((nsel, n, t_out, w), kv_dt))
                out_specs.append(kv_block)
        else:
            for _ in ("k", "v"):
                out_shapes.append(jax.ShapeDtypeStruct((n, t_out, w), kv_dt))
                out_specs.append(blocked((frames, t_out, w)))
        if kv_rows8:
            # per-row dequant scales (see fused_encoder_attn_block)
            for _ in ("ks", "vs"):
                out_shapes.append(jax.ShapeDtypeStruct((n, t_out, 1), jnp.float32))
                out_specs.append(blocked((frames, t_out, 1)))

    # default program order: phase-major (all stages interleaved across the
    # grid step's frames) on the int8 path — chip A/B: 52.2 vs 56.8 ms
    # frame-major at flagship shapes (PERF.md round 3; needs the 64 MB
    # scoped-VMEM raise above). bf16 whole-block keeps frame-major — its
    # doubled live ranges don't fit alongside 14.1 MB of resident weights.
    phase = os.environ.get("DFD_PHASE_MAJOR", "1" if int8_gemm else "0")
    int8_attn = (os.environ.get("DFD_INT8_ATTN", "0")
                 if int8_gemm else "0")
    if phase in ("1", "full", "mlp", "rows", "fr", "frm"):
        kern = _make_full_block_kernel_phased(
            heads, head_dim, frames, export, drop_cls, stacked=stacked,
            skip_inputs=len(aliases), int8_gemm=int8_gemm, int8_wo=int8_wo,
            kv_rows8=kv_rows8, mode="full" if phase == "1" else phase,
            int8_attn=int8_attn, kv_pad=kv_pad)
    else:
        kern = _make_full_block_kernel(
            heads, head_dim, frames, export, drop_cls, stacked=stacked,
            skip_inputs=len(aliases), int8_gemm=int8_gemm, int8_wo=int8_wo,
            kv_rows8=kv_rows8, kv_pad=kv_pad)
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid=(n // frames,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases=aliases,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*inputs)

    if not export:
        return outs if isinstance(outs, jax.Array) else outs[0]
    scales = (outs[3], outs[4]) if kv_rows8 else ()
    if stacked:
        return (outs[0], outs[1], outs[2], *scales)
    k, v = outs[1], outs[2]
    return (outs[0],
            k.reshape(n, t_out, heads, head_dim),
            v.reshape(n, t_out, heads, head_dim), *scales)


def _make_mlp_block_kernel(frames: int, int8_gemm: bool = False):
    """LN2 + c_fc + QuickGELU + c_proj + residual, one fused call."""

    def kernel(h_ref, *rest):
        if int8_gemm:
            (wfc_ref, wfcs_ref, bfc_ref, wproj_ref, wprojs_ref, bproj_ref,
             lns_ref, lnb_ref, ho_ref) = rest
        else:
            (wfc_ref, bfc_ref, wproj_ref, bproj_ref, lns_ref, lnb_ref,
             ho_ref) = rest
        for f in range(frames):
            hf = h_ref[f]  # (T, W) bf16
            x32 = hf.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * lns_ref[...] + lnb_ref[...]
            if int8_gemm:
                yq, y_s = _quant_rows(y)
                mid = _w8a8_dot(yq, y_s, wfc_ref, wfcs_ref) + bfc_ref[...]
            else:
                mid = jax.lax.dot_general(
                    y.astype(h_ref.dtype), wfc_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bfc_ref[...]
            mid = mid * jax.nn.sigmoid(1.702 * mid)  # QuickGELU, f32
            if int8_gemm:
                mq, m_s = _quant_rows(mid)
                out = _w8a8_dot(mq, m_s, wproj_ref, wprojs_ref) + bproj_ref[...]
            else:
                out = jax.lax.dot_general(
                    mid.astype(h_ref.dtype), wproj_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bproj_ref[...]
            ho_ref[f] = hf + out.astype(h_ref.dtype)

    return kernel


def fused_encoder_mlp_block(h: jax.Array, ln: dict, mlp: dict,
                            int8_gemm: bool = False) -> jax.Array:
    """One fused call for the encoder block's MLP half.

    h: (N, T, W) bf16; ln: ln_2 params; mlp: {"c_fc","c_proj"} fp32 params.
    Removes the separate LN pass over the stream and keeps the (T, 4W)
    intermediate in VMEM. 2 frames per grid step (the (2T, 4W) f32
    intermediate + both weight matrices bound VMEM; DFD_MLP_FRAMES
    overrides for experiments). ``int8_gemm`` runs both GEMMs as W8A8 with
    in-VMEM dynamic per-row activation quantization (op_mode.compute_int8).
    """
    import os

    n, t, w = h.shape
    hidden = mlp["c_fc"]["w"].shape[1]
    dt = h.dtype
    frames = int(os.environ.get("DFD_MLP_FRAMES", "2" if w <= 768 else "1"))
    while frames > 1 and n % frames:
        frames //= 2

    bfc = mlp["c_fc"]["b"].astype(jnp.float32).reshape(1, hidden)
    bproj = mlp["c_proj"]["b"].astype(jnp.float32).reshape(1, w)
    lns = ln["scale"].astype(jnp.float32).reshape(1, w)
    lnb = ln["bias"].astype(jnp.float32).reshape(1, w)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec((frames, t, w), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    if int8_gemm:
        wfc, wfcs = weight_q(mlp["c_fc"])
        wproj, wprojs = weight_q(mlp["c_proj"])
        in_specs = [
            blocked,
            const((w, hidden)), const((1, hidden)), const((1, hidden)),
            const((hidden, w)), const((1, w)), const((1, w)),
            const((1, w)), const((1, w)),
        ]
        inputs = (h, wfc, wfcs, bfc, wproj, wprojs, bproj, lns, lnb)
    else:
        wfc = mlp["c_fc"]["w"].astype(dt)
        wproj = mlp["c_proj"]["w"].astype(dt)
        in_specs = [
            blocked,
            const((w, hidden)), const((1, hidden)),
            const((hidden, w)), const((1, w)),
            const((1, w)), const((1, w)),
        ]
        inputs = (h, wfc, bfc, wproj, bproj, lns, lnb)

    return pl.pallas_call(
        _make_mlp_block_kernel(frames, int8_gemm=int8_gemm),
        out_shape=jax.ShapeDtypeStruct((n, t, w), dt),
        grid=(n // frames,),
        in_specs=in_specs,
        out_specs=blocked,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(*inputs)


def fused_encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """(N, T, H, D) x3 -> (N, T, H, D); two frames (all heads) per grid step."""
    n, t, h, d = q.shape
    hd = h * d
    frames = 2 if n % 2 == 0 else 1
    qf = q.reshape(n, t, hd)
    kf = k.reshape(n, t, hd)
    vf = v.reshape(n, t, hd)

    out = pl.pallas_call(
        _make_encoder_kernel(h, d, frames),
        out_shape=jax.ShapeDtypeStruct((n, t, hd), q.dtype),
        grid=(n // frames,),
        in_specs=[
            pl.BlockSpec((frames, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((frames, t, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(qf, kf, vf)
    return out.reshape(n, t, h, d)
