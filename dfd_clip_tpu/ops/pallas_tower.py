"""Whole-encoder megakernel: the full ViT tower in ONE Pallas call.

Replaces the per-layer ``fused_encoder_block`` chain of the frozen-CLIP hot
path (the reference's encoder loop, /root/reference/src/clip/model.py:236-294)
for inference. Structure:

  * grid = (chunks, layers) with **layers innermost**: a chunk of frames'
    residual stream is materialized ONCE into a persistent VMEM scratch
    buffer (``hbuf``) at ``l == 0`` and revisited by every layer step — the
    ~2.2 GB/predict of per-layer HBM round-trips of the residual stream at
    flagship shapes (12 x read+write of the (320, 197, 768) bf16 stream)
    collapses to one read per chunk. The price is that the per-layer weight
    windows re-stream once per chunk (~0.66 GB at 40-frame chunks, int8),
    which is why this only pays at large chunks — see PERF.md round 3.
  * weights are passed **stacked** ((L, ...) leaves, the checkpoint format —
    no relayout) and windowed per layer via the BlockSpec index_map; Mosaic
    double-buffers the next layer's weights under the current layer's
    compute.
  * K/V exports are **manual DMAs** into ANY-space stacked accumulators
    ((Lsel, N, T', W)), started right after the qkv GEMM of each frame group
    and waited at the end of the group — the copy rides under the group's
    attention+MLP compute. Windowed outputs would cost 2x double-buffered
    (1, F, T', W) VMEM windows; the DMA form costs one (gs, T', W) staging
    buffer.
  * the last kept layer runs LN1 + qkv + export only (its attention/MLP are
    dead work — same dead-code shape as clip_vit.clip_vision_kv's unrolled
    loop); all other layers run the whole block in-kernel with the
    phase-major-MLP schedule that won the round-3 chip ladder
    (ops/pallas_attention._make_full_block_kernel_phased, mode="mlp").

Inference-only (no VJP), like the per-layer fused kernels: training
differentiates the XLA composition. Enabled via DFD_MEGAKERNEL (see
clip_vit.clip_vision_kv for the auto-selection rule).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import (
    _attn_int8_cols,
    _compiler_params,
    _exp_probs,
    _interpret,
    _quant_rows,
)


def _quantize_weight_stack(w):
    """fp32 (L, K, N) -> int8 stack + (L, 1, N) f32 per-(layer, channel)
    absmax scales (the stacked form of pallas_attention.quantize_weight)."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=1, keepdims=True) + 1e-8
    return jnp.round(w / s * 127.0).astype(jnp.int8), s


def _stack_q(p, sl):
    """Pre-quantized ("wq", "ws") stacked leaves when present
    (clip_vit.prepare_int8_params), else quantize the slice at trace time."""
    if "wq" in p:
        return sl(p["wq"]), sl(p["ws"])
    return _quantize_weight_stack(sl(p["w"]))


def _make_tower_kernel(
    heads: int,
    head_dim: int,
    frames: int,
    group: int,
    first: int,
    last: int,
    drop_cls: bool,
    int8_gemm: bool,
    int8_wo: bool,
    int8_attn: str,
    dma_export: bool,
    dt,
    t_valid: int,
    t_pad: int,
):
    w = heads * head_dim
    lo = 1 if drop_cls else 0
    t_out = t_valid - 1 if drop_cls else t_valid
    scale = head_dim ** -0.5
    padded = t_pad != t_valid

    def kernel(h_any, *rest):
        if int8_gemm:
            (wqkv_ref, wqs_ref, bqkv_ref, wo_ref, wos_ref, bo_ref,
             ln1s_ref, ln1b_ref,
             wfc_ref, wfcs_ref, bfc_ref, wproj_ref, wprojs_ref, bproj_ref,
             ln2s_ref, ln2b_ref, *tail) = rest
        else:
            (wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
             wfc_ref, bfc_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
             *tail) = rest
            wqs_ref = wfcs_ref = wprojs_ref = wos_ref = None
        if dma_export:
            k_any, v_any, hbuf, kbuf, vbuf, sem = tail
        else:
            k_win, v_win, hbuf, sem = tail
        c = pl.program_id(0)
        l = pl.program_id(1)

        @pl.when(l == 0)
        def _():
            # hydrate the chunk's residual stream into the persistent
            # scratch carry (one HBM read per chunk; ~15 us at 40 frames)
            cp = pltpu.make_async_copy(
                h_any.at[pl.ds(c * frames, frames)], hbuf, sem.at[0])
            cp.start()
            cp.wait()

        def ln(x32, s_ref, b_ref):
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            return (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * s_ref[0] + b_ref[0]

        def gemm(y32, w_ref, ws_ref, b_ref):
            if int8_gemm:
                yq, y_s = _quant_rows(y32)
                acc = jax.lax.dot_general(
                    yq, w_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * (y_s / 127.0)
                        * (ws_ref[0] / 127.0)) + b_ref[0]
            return jax.lax.dot_general(
                y32.astype(dt), w_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_ref[0]

        def oproj(attn32):
            if int8_wo:
                aq, a_s = _quant_rows(attn32)
                acc = jax.lax.dot_general(
                    aq, wo_ref[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return (acc.astype(jnp.float32) * (a_s / 127.0)
                        * (wos_ref[0] / 127.0)) + bo_ref[0]
            return jax.lax.dot_general(
                attn32.astype(dt), wo_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + bo_ref[0]

        def col(base, h):
            return slice(base + h * head_dim, base + (h + 1) * head_dim)

        # Mosaic tile alignment (session-10 chip fix, PERF.md round 3): the
        # token axis is zero-padded to a multiple of 8 OUTSIDE the call so
        # every HBM slice of the residual stream is tile-aligned. Pad rows
        # must never contribute softmax mass as KEYS (masked below); their
        # own query/MLP garbage stays in hbuf's pad rows, which are re-zeroed
        # at each layer store so no unbounded growth can reach inf/NaN.
        neg_cols = (jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)
                    >= t_valid) if padded else None
        row_pad = (jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
                   >= t_valid) if padded else None

        def attend(hf32, xf):
            """frame-major attention half: logits -> softmax -> mix ->
            out-proj -> residual (cf. _make_full_block_kernel_phased).

            ``int8_attn`` (DFD_INT8_ATTN) also runs the two attention GEMMs
            on the int8 MXU (pallas_attention._attn_int8_cols)."""
            if int8_attn != "0":
                cols = _attn_int8_cols(xf, heads, head_dim, scale,
                                       qk_only=int8_attn == "qk",
                                       kv_len=t_valid if padded else None)
                return hf32 + oproj(jnp.concatenate(cols, axis=-1))
            logits = [
                jax.lax.dot_general(
                    xf[:, col(0, h)], xf[:, col(w, h)],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                for h in range(heads)
            ]
            ps, sums = [], []
            for lg in logits:
                if neg_cols is not None:
                    # where (not add): NaN/inf in a pad column must not
                    # survive into the exp
                    lg = jnp.where(neg_cols, -1e30, lg)
                p = _exp_probs(lg)
                ps.append(p.astype(dt))
                sums.append(1.0 / jnp.sum(p, axis=-1, keepdims=True))
            cols = [
                jnp.dot(ps[h], xf[:, col(2 * w, h)],
                        preferred_element_type=jnp.float32) * sums[h]
                for h in range(heads)
            ]
            return hf32 + oproj(jnp.concatenate(cols, axis=-1))

        def group_body(g, carry):
            """One group of `group` frames: qkv phase, export DMA, attention
            (frame-major) + MLP (phase-major). `g` may be traced (fori_loop)
            — frame reads/writes use a dynamic base into the scratch carry;
            frames within the group unroll statically."""
            base = g * group
            # qkv phase (phase-major: all frames' LN1+GEMM interleave)
            hf32s = [hbuf[base + i].astype(jnp.float32) for i in range(group)]
            xfs = [gemm(ln(h32, ln1s_ref, ln1b_ref), wqkv_ref, wqs_ref,
                        bqkv_ref).astype(dt)
                   for h32 in hf32s]

            if dma_export:
                # export: stage this group's K/V rows and launch the DMAs;
                # the copies ride under the attention+MLP compute below
                kcp = pltpu.make_async_copy(
                    kbuf, k_any.at[l - first, pl.ds(c * frames + base, group)],
                    sem.at[1])
                vcp = pltpu.make_async_copy(
                    vbuf, v_any.at[l - first, pl.ds(c * frames + base, group)],
                    sem.at[2])

                @pl.when(l >= first)
                def _():
                    for i, xf in enumerate(xfs):
                        kbuf[i] = xf[lo : lo + t_out, w : 2 * w]
                        vbuf[i] = xf[lo : lo + t_out, 2 * w :]
                    kcp.start()
                    vcp.start()
            else:
                # windowed export (DFD_TOWER_EXPORT=window, and the
                # auto-route whenever T' % 8 != 0 — CLIP's 196 always): write
                # into the slot-indexed (1, F, T', W) output window. The
                # window spans the full token dim, so Mosaic handles the
                # unaligned 196 edge; the manual-DMA form cannot (HBM slice
                # alignment). The window index is constant while l < first
                # (slot clamps to 0), so the stale pre-export content is
                # never flushed; the first flush happens when the slot
                # advances past a REAL write.
                @pl.when(l >= first)
                def _():
                    for i, xf in enumerate(xfs):
                        k_win[0, base + i] = xf[lo : lo + t_out, w : 2 * w]
                        v_win[0, base + i] = xf[lo : lo + t_out, 2 * w :]

            @pl.when(l < last)
            def _():
                # attention frame-major (its intermediates die per frame);
                # MLP phase-major (the chip-ladder winner: GELU/quant VPU
                # passes interleave under the MXU GEMMs)
                hmids = [attend(h32, xf) for h32, xf in zip(hf32s, xfs)]
                y2s = [ln(hm, ln2s_ref, ln2b_ref) for hm in hmids]
                mids = [gemm(y2, wfc_ref, wfcs_ref, bfc_ref) for y2 in y2s]
                mids = [m * jax.nn.sigmoid(1.702 * m) for m in mids]
                for i, (hm, mid) in enumerate(zip(hmids, mids)):
                    out2 = gemm(mid, wproj_ref, wprojs_ref, bproj_ref)
                    hnew = hm + out2
                    if row_pad is not None:
                        # keep pad rows at zero: their garbage is re-derived
                        # from zeros each layer (single-layer bounded) so it
                        # can never random-walk to inf across the stack
                        hnew = jnp.where(row_pad, 0.0, hnew)
                    hbuf[base + i] = hnew.astype(dt)

            if dma_export:
                @pl.when(l >= first)
                def _():
                    # staging buffers are rewritten next group: fence here
                    kcp.wait()
                    vcp.wait()

            return carry

        # fori_loop keeps the Mosaic program size constant in the chunk size
        # (a Python unroll at 40 frames/chunk would be ~10-20x the per-layer
        # kernels' body — compile-time poison); one group unrolls statically.
        n_groups = frames // group
        if n_groups > 1:
            jax.lax.fori_loop(0, n_groups, group_body, 0)
        else:
            group_body(0, 0)

    return kernel


def tower_frames(n: int) -> tuple[int, int]:
    """(frames-per-chunk, frames-per-DMA-group) for a batch of n frames.

    Large chunks amortize the per-chunk weight re-stream (6.9 MB int8 per
    layer at ViT-B): 40+ frames is past break-even at flagship shapes
    (PERF.md round-3 accounting). The group bounds the phased-MLP live set
    (~5 MB f32 per frame). DFD_TOWER_FRAMES / DFD_TOWER_GROUP override."""
    frames = int(os.environ.get("DFD_TOWER_FRAMES", "40"))
    while frames > 1 and n % frames:
        frames -= 1
    group = int(os.environ.get("DFD_TOWER_GROUP", "4"))
    while group > 1 and frames % group:
        group //= 2
    return frames, group


def fused_encoder_tower(
    h: jax.Array,
    blocks: dict,
    heads: int,
    head_dim: int,
    *,
    keep: tuple,
    drop_cls: bool = False,
    int8_gemm: bool = False,
):
    """Run encoder layers 0..max(keep) in one Pallas call, returning the
    stacked K/V exports.

    h: (N, T, W) bf16 post-embed residual stream. blocks: the STACKED
    per-layer params pytree ((L, ...) leaves, clip_vit checkpoint format).
    keep must be a contiguous layer range ending at max(keep) (the flagship
    keep-last-k pattern) — the export slot index is then an affine function
    of the layer grid index. Returns (k, v): (Lsel, N, T', W) in h.dtype.
    """
    n, t, w = h.shape
    assert w == heads * head_dim
    keep = tuple(sorted(keep))
    first, last = keep[0], keep[-1]
    assert keep == tuple(range(first, last + 1)), (
        "megakernel needs a contiguous keep-layer range; got %r" % (keep,))
    nsel = len(keep)
    t_out = t - 1 if drop_cls else t
    dt = h.dtype
    frames, group = tower_frames(n)

    # Mosaic requires HBM slices to be 8-row tile-aligned in the second-minor
    # dim: the hydrate DMA slices (frames, T, W) out of the residual stream,
    # so T is zero-padded to a multiple of 8 (CLIP: 197 -> 200) before the
    # call. Pad keys are masked inside the kernel; pad rows are never
    # exported (exports slice [lo:lo+t_out]).
    t_pad = -(-t // 8) * 8
    if t_pad != t:
        h = jnp.pad(h, ((0, 0), (0, t_pad - t), (0, 0)))

    sl = lambda a: a[: last + 1]
    hidden = blocks["mlp"]["c_fc"]["w"].shape[-1]
    bqkv = sl(blocks["attn"]["in_proj"]["b"]).astype(jnp.float32).reshape(-1, 1, 3 * w)
    bo = sl(blocks["attn"]["out_proj"]["b"]).astype(jnp.float32).reshape(-1, 1, w)
    ln1s = sl(blocks["ln_1"]["scale"]).astype(jnp.float32).reshape(-1, 1, w)
    ln1b = sl(blocks["ln_1"]["bias"]).astype(jnp.float32).reshape(-1, 1, w)
    bfc = sl(blocks["mlp"]["c_fc"]["b"]).astype(jnp.float32).reshape(-1, 1, hidden)
    bproj = sl(blocks["mlp"]["c_proj"]["b"]).astype(jnp.float32).reshape(-1, 1, w)
    ln2s = sl(blocks["ln_2"]["scale"]).astype(jnp.float32).reshape(-1, 1, w)
    ln2b = sl(blocks["ln_2"]["bias"]).astype(jnp.float32).reshape(-1, 1, w)

    lconst = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda c, l: (l,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    int8_wo = int8_gemm and os.environ.get("DFD_INT8_WO", "1") == "1"
    int8_attn = (os.environ.get("DFD_INT8_ATTN", "0")
                 if int8_gemm else "0")
    if int8_gemm:
        wqkv, wqs = _stack_q(blocks["attn"]["in_proj"], sl)
        wfc, wfcs = _stack_q(blocks["mlp"]["c_fc"], sl)
        wproj, wprojs = _stack_q(blocks["mlp"]["c_proj"], sl)
        if int8_wo:
            wo, wos = _stack_q(blocks["attn"]["out_proj"], sl)
        else:
            wo = sl(blocks["attn"]["out_proj"]["w"]).astype(dt)
            wos = jnp.zeros((last + 1, 1, w), jnp.float32)  # unused dummy
        inputs = [h, wqkv, wqs, bqkv, wo, wos, bo, ln1s, ln1b,
                  wfc, wfcs, bfc, wproj, wprojs, bproj, ln2s, ln2b]
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            lconst((w, 3 * w)), lconst((1, 3 * w)), lconst((1, 3 * w)),
            lconst((w, w)), lconst((1, w)), lconst((1, w)),
            lconst((1, w)), lconst((1, w)),
            lconst((w, hidden)), lconst((1, hidden)), lconst((1, hidden)),
            lconst((hidden, w)), lconst((1, w)), lconst((1, w)),
            lconst((1, w)), lconst((1, w)),
        ]
    else:
        wqkv = sl(blocks["attn"]["in_proj"]["w"]).astype(dt)
        wo = sl(blocks["attn"]["out_proj"]["w"]).astype(dt)
        wfc = sl(blocks["mlp"]["c_fc"]["w"]).astype(dt)
        wproj = sl(blocks["mlp"]["c_proj"]["w"]).astype(dt)
        inputs = [h, wqkv, bqkv, wo, bo, ln1s, ln1b,
                  wfc, bfc, wproj, bproj, ln2s, ln2b]
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            lconst((w, 3 * w)), lconst((1, 3 * w)),
            lconst((w, w)), lconst((1, w)), lconst((1, w)), lconst((1, w)),
            lconst((w, hidden)), lconst((1, hidden)),
            lconst((hidden, w)), lconst((1, w)),
            lconst((1, w)), lconst((1, w)),
        ]

    # Export mechanism: "dma" writes K/V by manual async copy into ANY-space
    # outputs — VMEM cost is one (group, T', W) staging pair, but the HBM
    # destination slice must be 8-row aligned, so it is only legal when
    # T' % 8 == 0 (DINOv2's 256; never CLIP's 196). Otherwise the export
    # auto-routes to "window": slot-indexed output windows — the window
    # spans the full token dim (alignment-free) at the cost of two
    # double-buffered (1, F, T', W) VMEM windows (~1.2 MB/frame), which is
    # why the window form defaults the scoped-VMEM request to 96 MB.
    # DFD_TOWER_EXPORT=window forces the fallback.
    dma_export = (os.environ.get("DFD_TOWER_EXPORT", "dma") != "window"
                  and t_out % 8 == 0)
    if dma_export:
        out_specs = (
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        )
        scratch = [
            pltpu.VMEM((frames, t_pad, w), dt),    # hbuf: the residual carry
            pltpu.VMEM((group, t_out, w), dt),     # kbuf: K staging
            pltpu.VMEM((group, t_out, w), dt),     # vbuf: V staging
            pltpu.SemaphoreType.DMA((3,)),
        ]
    else:
        kv_win = pl.BlockSpec(
            (1, frames, t_out, w),
            lambda cc, ll: (jnp.maximum(ll - first, 0), cc, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_specs = (kv_win, kv_win)
        scratch = [
            pltpu.VMEM((frames, t_pad, w), dt),    # hbuf: the residual carry
            pltpu.SemaphoreType.DMA((1,)),         # h-load only
        ]

    k, v = pl.pallas_call(
        _make_tower_kernel(heads, head_dim, frames, group, first, last,
                           drop_cls, int8_gemm, int8_wo, int8_attn,
                           dma_export, dt, t, t_pad),
        out_shape=(
            jax.ShapeDtypeStruct((nsel, n, t_out, w), dt),
            jax.ShapeDtypeStruct((nsel, n, t_out, w), dt),
        ),
        grid=(n // frames, last + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=_interpret(),
        # the windowed-export form carries double-buffered per-layer weight
        # sets: ~7 MB int8 but ~14 MB bf16 — the bf16 variant's total scoped
        # demand at flagship geometry is 103.2 MB, over the int8-sized 96 MB
        # request (chip compile check, round 4). 112 keeps 16 MB headroom
        # under the v5e's 128 MB VMEM.
        compiler_params=_compiler_params(
            64 if dma_export else (96 if int8_gemm else 112)),
    )(*inputs)
    return k, v
