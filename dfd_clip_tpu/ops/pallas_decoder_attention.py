"""Pallas fused single-query dual-activation (softmax + CoDA) attention.

The decoder's hot op (src/models.py:99-146 semantics; ops/decoder_attention.py
is the XLA spec): ONE learned query per sample attends L = frames x patches
K/V tokens with the mean of a masked softmax and a CoDA (tanh x L1-sigmoid
gate) activation.

The XLA path costs ~3.8 ms per decoder block at (B=16, L=3920): the
``|q_coda - k|`` L1 gate broadcasts to a materialized (B, L, H, D) float32
intermediate (~770 MB of HBM round-trip per block) and K is re-read for each
of the three contractions. This kernel makes one pass over K and V per
block, entirely in VMEM per tile:

  * K and V stay in their natural (B, L, H*D) layout (no transposed copy);
    grid = (batch, L tiles), one sample's tile per step.
  * Per-head logits for BOTH activations come from ONE MXU issue:
    ``k_tile @ Qblk`` where Qblk (H*D, 2H) is the block-diagonal query matrix
    (column h carries q_smax of head h in rows [hD,(h+1)D), column H+h
    carries q_coda) — built once per sample by the XLA caller (tiny).
  * The softmax runs as an online (flash-style) accumulation across L tiles:
    running per-head max / denominator with accumulator rescaling. The CoDA
    branch needs no normalization and accumulates directly.
  * PV uses a per-head weight broadcast (pltpu.repeat to H*D lanes) and a
    multiply-accumulate over the tile — no (L, 1) single-lane math.

Measured on v5e (PERF.md methodology): 22.8 ms -> ~2 ms for the 6-block
decoder at the flagship shape. Default on TPU for the unfactorized
single-query path; attn_mode variants dispatch to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from .pallas_attention import (  # noqa: E402  (shared VMEM/interpret knobs)
    _compiler_params,
    _interpret,
)


def _pick_tile(l: int) -> int:
    """512-row tiles (1.5 MB K+V per step, double-buffered); whole-L for
    short streams. DFD_DEC_TILE overrides for experiments."""
    import os

    tile = int(os.environ.get("DFD_DEC_TILE", "512"))
    return tile if l > tile else -(-l // 128) * 128


_NEG_BIG = -1e30  # finite stand-in for -inf in the running max (avoids
                  # -inf - -inf = NaN on fully-masked prefixes)


def _kernel(qblk_ref, qc_ref, k_ref, v_ref, m_ref, pos_ref, *rest,
            heads: int, head_dim: int, scale: float, l_real: int, lt: int,
            with_pos: bool, stacked_in: bool = False, partials: bool = False,
            batched: bool = True, deq: bool = False):
    """One (sample, L-tile) step.

    Blocks: qblk (1, HD, 2H), qc (1, 1, HD), k/v (1, Lt, HD), m (1, Lt, 1),
    pos (Lt, HD), out (1, 1, HD). Scratch: acc (2H, HD) f32 — rows [:H] the
    un-normalized softmax PV, rows [H:] the CoDA PV — run_d (1, H) f32
    softmax denominators, and run_m (1, H) f32 running logit maxima. The
    softmax is an EXACT online accumulation: each tile rescales the running
    numerator/denominator by exp(m_old - m_new) — a per-head (2H, 1) VPU
    broadcast multiply over the accumulator, NOT the M=1 rescale matmuls
    that dominated an earlier design (PERF.md); decoder queries are
    trainable, so a fixed logit clamp (the previous scheme) could silently
    diverge from the XLA path on checkpoints with large logits. Per step:
    TWO MXU issues (logits, combined PV) + the |qc-k| L1 matmul;
    normalization happens once on the final tile. The final tile may read
    past L; out-of-bounds rows are masked via ``l_real``.

    ``partials`` (the sequence-parallel form, ops/spmd.py): instead of the
    normalized combined output, the final tile emits the per-shard softmax
    partial state — un-normalized E-compacted numerator, CoDA output,
    denominator, running max — so the caller can combine shards exactly with
    psum/pmax (one-query distributed softmax, SURVEY.md §5.7).
    """
    # ``batched`` grid is (L-tiles, batch) — tiles OUTER, samples inner — so
    # the shared temporal-pos tile's block index is unchanged across the
    # inner sweep and Mosaic fetches it once per tile instead of once per
    # (sample, tile) (saves ~1 GB of HBM reads per flagship predict). The
    # accumulators are then per-sample slices of (B, ·) scratch — which
    # Mosaic only slices cleanly when the per-sample planes are full
    # (8, 128) tiles (see fused_decoder_attention's gate); small geometries
    # use the classic (batch, L-tiles) grid with whole-scratch accumulators.
    if batched:
        t, i = pl.program_id(0), pl.program_id(1)
    else:
        i, t = pl.program_id(0), pl.program_id(1)
    hd = heads * head_dim
    if deq:
        ks_ref, vs_ref, *out_and_scratch = rest
    else:
        ks_ref = vs_ref = None
        out_and_scratch = rest
    if partials:
        o_ref, st_ref, accs, run_ds, run_ms = out_and_scratch
    else:
        o_ref, accs, run_ds, run_ms = out_and_scratch
        st_ref = None
    if batched:
        # per-sample views of (B, ·) scratch; mosaic memref_slice requires
        # every sliced plane to be whole (8, 128) tiles — run_d/run_m carry
        # a lane-padded head dim (hp = 128·⌈H/128⌉) for exactly this reason,
        # and all running-stat math below runs at full hp width (padded
        # lanes hold harmless values; no masked sub-tile stores).
        acc, run_d, run_m = accs.at[i], run_ds.at[i], run_ms.at[i]
    else:
        acc, run_d, run_m = accs, run_ds, run_ms
    hp = run_ds.shape[-1]

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        run_d[:] = jnp.zeros_like(run_d)
        run_m[:] = jnp.full_like(run_m, _NEG_BIG)

    k = k_ref[0, 0] if stacked_in else k_ref[0]   # (Lt, HD) bf16 (int8 w/ deq)
    v = v_ref[0, 0] if stacked_in else v_ref[0]   # (Lt, HD) bf16 (int8 w/ deq)
    row = jax.lax.broadcasted_iota(jnp.int32, (lt, 1), 0) + t * lt
    mcol = (m_ref[0] > 0) & (row < l_real)   # (Lt, 1) bool
    if deq:
        # int8_rows K/V: the int8 stream halves the HBM reads this kernel is
        # bandwidth-bound on, and each tensor pays exactly ONE int8 unpack
        # pass (the packed (32, 128)-tiled int8 -> float relayout is the
        # expensive VPU step; a first cut that dequantized both tensors to
        # f32 and back to bf16 cost more than the bandwidth it saved):
        #   * K dequantizes at bf16 — int8 values are exact in bf16 and the
        #     scale's bf16 rounding (~0.4% rel) sits inside the int8 quant
        #     noise — so the logits matmul stays a bf16 MXU issue. (A second
        #     cut dequantized K to f32 and ran logits + wboth@pos at f32;
        #     the v5e MXU's ~1/8 f32 rate cost ~1.2 ms/predict across the
        #     768 grid steps, more than the halved K/V DMA saved.)
        #   * V converts once to the compute dtype; its per-row scale is
        #     folded into the (Lt, 2H) attention weights below (32x fewer
        #     elements than the (Lt, HD) V dequant), and the temporal-pos
        #     term is restored by a separate skinny `wboth @ pos` MXU issue.
        ks = ks_ref[0, 0] if stacked_in else ks_ref[0]   # (Lt, 1) f32
        vs = vs_ref[0, 0] if stacked_in else vs_ref[0]
        # the final tile's OOB scale rows are undefined memory; their weight
        # rows are 0 but 0*NaN inside the MXU would still poison PV
        vs = jnp.where(row < l_real, vs, 0.0)
        cdt = qblk_ref.dtype
        k = k.astype(cdt) * ks.astype(cdt)
        if with_pos:
            k = k + pos_ref[...]  # pos zero-padded to the tile grid w/ deq
        v = v.astype(cdt)  # int8 garbage is finite: no NaN guard
    else:
        vs = None
        if with_pos:
            # shared temporal positional embedding, added to BOTH K and V
            # here — in-VMEM, so the (B, L, H, D) pos-added copies the XLA
            # path materializes never exist (decoder.py:163-165 semantics)
            k = k + pos_ref[...]
            v = v + pos_ref[...]
        # zero V's out-of-bounds rows: boundary-tile reads are undefined
        # memory, and NaN garbage would poison the 0-weighted PV
        # accumulation (0*NaN=NaN)
        v = jnp.where(row < l_real, v, jnp.zeros((), v.dtype))

    # E (H, HD): E[h, h*D+d] = 1 — the head->lanes expansion. Broadcasting a
    # per-head vector to HD lanes is E-matmul (pltpu.repeat is TILE repeat,
    # not element repeat); extracting per-head diagonal blocks of an (H, HD)
    # product is multiply-by-E + column sum.
    col_head = jax.lax.broadcasted_iota(jnp.int32, (heads, hd), 1) // head_dim
    row_head = jax.lax.broadcasted_iota(jnp.int32, (heads, hd), 0)
    E = (col_head == row_head).astype(jnp.float32)

    # all-heads logits, both activations, one MXU issue: (Lt, 2H) f32
    logits = jax.lax.dot_general(
        k, qblk_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    ls = logits[:, :heads]             # (Lt, H) softmax logits
    lc = logits[:, heads:]             # (Lt, H) coda logits

    # ---- CoDA branch: tanh(lc) * 2*sigmoid(-|qc - k|_1 * scale) * mask ----
    diff = jnp.abs(qc_ref[0] - k.astype(jnp.float32))  # (Lt, HD) f32
    # per-head L1 as ONE MXU segmented sum (|diff| @ E^T) instead of H
    # sliced 64-lane reductions + concatenate
    l1 = jax.lax.dot_general(
        diff, E, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lt, H)
    gate = 2.0 * jax.nn.sigmoid(-l1 * scale)
    wc = jnp.where(mcol, jnp.tanh(lc) * gate, 0.0)     # (Lt, H)

    # ---- softmax branch: exact online max + rescale (full hp width) ----
    pad = ((0, 0), (0, hp - heads))
    tile_max = jnp.max(jnp.where(mcol, ls, _NEG_BIG), axis=0, keepdims=True)
    new_m = jnp.maximum(run_m[:], jnp.pad(tile_max, pad,
                                          constant_values=_NEG_BIG))  # (1, hp)
    fac = jnp.exp(run_m[:] - new_m)                    # (1, hp) ≤ 1; pad: 1
    run_m[:] = new_m
    p = jnp.where(mcol, jnp.exp(ls - new_m[:, :heads]), 0.0)   # (Lt, H)
    run_d[:] = run_d[:] * fac + jnp.pad(
        jnp.sum(p, axis=0, keepdims=True), pad)
    fac = fac[:, :heads]                                       # (1, H)

    # combined PV for BOTH branches: one (2H, Lt)x(Lt, HD) MXU issue; the
    # softmax half of the accumulator rescales by fac, the CoDA half by 1
    wboth = jnp.concatenate([p, wc], axis=1)                   # (Lt, 2H) f32
    fac_rows = jnp.concatenate(
        [fac, jnp.ones_like(fac)], axis=1
    ).reshape(2 * heads, 1)                                    # (2H, 1)
    if deq:
        # V scale folded into the weights; Σ w·(v·vs + pos) = (w·vs)@v + w@pos
        pv = jax.lax.dot_general(
            (wboth * vs).astype(v.dtype), v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if with_pos:
            pv = pv + jax.lax.dot_general(
                wboth.astype(pos_ref.dtype), pos_ref[...],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        pv = jax.lax.dot_general(
            wboth.astype(v.dtype), v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc[:] = acc[:] * fac_rows + pv  # (2H, HD)

    @pl.when(t == pl.num_programs(0 if batched else 1) - 1)
    def _():
        if partials:
            # un-normalized per-shard state for the cross-shard combine
            o_s_un = jnp.sum(acc[:heads] * E, axis=0, keepdims=True)  # (1, HD)
            o_c = jnp.sum(acc[heads:] * E, axis=0, keepdims=True)
            o_ref[0] = jnp.concatenate([o_s_un, o_c], axis=0)         # (2, HD)
            st_ref[0] = jnp.concatenate(
                [run_d[:, :heads], run_m[:, :heads]], axis=0)          # (2, H)
        else:
            denom = jnp.maximum(run_d[:, :heads], 1e-30)  # fully-masked -> 0 out
            # per-head normalize the softmax rows, then E-mask both halves
            # down to their own head's lane block and sum over heads
            o_s = jnp.sum(acc[:heads] * (1.0 / denom).reshape(heads, 1) * E,
                          axis=0, keepdims=True)       # (1, HD)
            o_c = jnp.sum(acc[heads:] * E, axis=0, keepdims=True)
            o_ref[0] = (0.5 * (o_s + o_c)).astype(o_ref.dtype)


def fused_decoder_attention(
    q_smax: jax.Array,
    q_coda: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    temporal_pos: jax.Array | None = None,
    layer: int | None = None,
    partials: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """(B,1,H,D), (B,1,H,D), (B,L,H,D), (B,L,H,D), (B,L) -> (B,1,H,D).

    ``temporal_pos`` ((L, H, D) or broadcastable): the decoder's shared
    temporal positional embedding, added to K AND V inside the kernel —
    callers should NOT pre-add it (that materializes two (B, L, H, D)
    copies the fusion exists to avoid). L may be any size; the final
    partial tile is masked in-kernel (no padding copies).

    ``layer``: when set, k/v are the FULL stacked (Lsel, B, L, H, D)
    export buffers and this call reads slot ``layer`` via its BlockSpec
    index map. Custom-call operands cannot alias a producer slice, so
    passing ``k_all[i]`` materializes a fresh (B, L, H, D) copy per block
    (measured ~1.1 ms/block at flagship shapes); indexing inside the block
    spec reads the encoder's accumulator directly — zero copies.

    ``partials``: return the per-shard combine state instead of the final
    output — ``(o_sc, st)`` with o_sc (B, 2, H·D) f32 [row 0: un-normalized
    softmax numerator, row 1: CoDA output] and st (B, 2, H) f32 [row 0:
    softmax denominator, row 1: running max]. Used by ops/spmd.py to run the
    kernel on sequence-sharded K/V and combine shards exactly with psum."""
    b, q, h, d = q_smax.shape
    assert q == 1, "fused decoder attention is specialized for a single query"
    stacked_in = layer is not None
    l = k.shape[2] if stacked_in else k.shape[1]
    hd = h * d
    scale = d ** -0.5
    lt = _pick_tile(l)
    n_tiles = -(-l // lt)
    deq = k_scale is not None
    # compute dtype: K/V arrive int8 on the int8_rows path — queries, pos
    # and the output use bf16 there
    cd = jnp.bfloat16 if k.dtype == jnp.int8 else k.dtype

    if stacked_in:
        nblk = k.shape[0]
        kf = k.reshape(nblk, b, l, hd)
        vf = v.reshape(nblk, b, l, hd)
    else:
        kf = k.reshape(b, l, hd)
        vf = v.reshape(b, l, hd)
    mf = mask.astype(jnp.int32)[..., None]  # (B, L, 1)

    # tiles-outer grid + per-sample scratch slices only when every scratch
    # plane is whole (8, 128) tiles — Mosaic rejects slicing smaller planes
    # ("slice shape must be aligned to tiling"). Flagship (H=12, HD=768) and
    # ViT-L (H=16, HD=1024) qualify; tiny test towers fall back to the
    # classic samples-outer grid. DFD_DEC_BATCHED=0 forces the fallback.
    import os

    batched = (hd % 128 == 0 and (2 * h) % 8 == 0
               and os.environ.get("DFD_DEC_BATCHED", "1") == "1")

    def imap(f):
        """wrap an index map written in (t, i) terms for the active grid
        order: grid is (t, i) when batched else (i, t)."""
        if batched:
            return f
        return lambda i, t, **kw: f(t, i, **kw)

    with_pos = temporal_pos is not None
    if with_pos:
        pos = jnp.broadcast_to(temporal_pos, (l, h, d)).reshape(l, hd).astype(cd)
        if deq and n_tiles * lt > l:
            # deq feeds pos into a `wboth @ pos` MXU issue whose OOB rows
            # carry 0 weights — zero-pad so 0*garbage can't produce NaN
            pos = jnp.pad(pos, ((0, n_tiles * lt - l), (0, 0)))
        pos_index = imap(lambda t, i: (t, 0))
    else:
        pos = jnp.zeros((lt, hd), cd)  # unused dummy block
        pos_index = imap(lambda t, i: (0, 0))

    # block-diagonal query matrix: one matmul yields all heads' logits for
    # both activations. (B, HD, 2H), tiny (~0.6 MB bf16 at flagship shape).
    eye = jnp.eye(h, dtype=cd)
    qs_blk = (q_smax[:, 0].astype(cd)[..., None] * eye[None, :, None, :]).reshape(b, hd, h)
    qc_blk = (q_coda[:, 0].astype(cd)[..., None] * eye[None, :, None, :]).reshape(b, hd, h)
    qblk = jnp.concatenate([qs_blk, qc_blk], axis=2)   # (B, HD, 2H)
    qc_row = q_coda[:, 0].reshape(b, 1, hd).astype(jnp.float32)

    kernel = functools.partial(
        _kernel, heads=h, head_dim=d, scale=scale, l_real=l, lt=lt,
        with_pos=with_pos, stacked_in=stacked_in, partials=partials,
        batched=batched, deq=deq,
    )
    if stacked_in:
        kv_spec = pl.BlockSpec(
            (1, 1, lt, hd),
            imap(lambda t, i, _layer=layer: (_layer, i, t, 0)),
            memory_space=pltpu.VMEM,
        )
        sc_spec = pl.BlockSpec(
            (1, 1, lt, 1),
            imap(lambda t, i, _layer=layer: (_layer, i, t, 0)),
            memory_space=pltpu.VMEM,
        )
    else:
        kv_spec = pl.BlockSpec((1, lt, hd), imap(lambda t, i: (i, t, 0)),
                               memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec((1, lt, 1), imap(lambda t, i: (i, t, 0)),
                               memory_space=pltpu.VMEM)
    if partials:
        out_shape = (
            jax.ShapeDtypeStruct((b, 2, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, h), jnp.float32),
        )
        out_specs = (
            pl.BlockSpec((1, 2, hd), imap(lambda t, i: (i, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h), imap(lambda t, i: (i, 0, 0)), memory_space=pltpu.VMEM),
        )
    else:
        out_shape = jax.ShapeDtypeStruct((b, 1, hd), cd)
        out_specs = pl.BlockSpec((1, 1, hd), imap(lambda t, i: (i, 0, 0)),
                                 memory_space=pltpu.VMEM)
    hp = -(-h // 128) * 128   # lane-padded head dim for the running stats
    acc_shape = (b, 2 * h, hd) if batched else (2 * h, hd)
    run_shape = (b, 1, hp) if batched else (1, hp)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles, b) if batched else (b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, hd, 2 * h), imap(lambda t, i: (i, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), imap(lambda t, i: (i, 0, 0)), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, lt, 1), imap(lambda t, i: (i, t, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((lt, hd), pos_index, memory_space=pltpu.VMEM),
        ] + ([sc_spec, sc_spec] if deq else []),
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(acc_shape, jnp.float32),
            pltpu.VMEM(run_shape, jnp.float32),   # run_d
            pltpu.VMEM(run_shape, jnp.float32),   # run_m
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(qblk, qc_row, kf, vf, mf, pos,
      *((k_scale, v_scale) if deq else ()))
    if partials:
        return out
    return out.reshape(b, 1, h, d)
