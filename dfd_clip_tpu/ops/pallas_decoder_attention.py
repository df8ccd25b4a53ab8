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


def _bwd_kernel(qblk_ref, qrows_ref, g0blk_ref, stats_ref, k_ref, v_ref,
                m_ref, pos_ref, *rest, heads: int, head_dim: int,
                scale: float, l_real: int, lt: int, with_pos: bool,
                stacked_in: bool, hpad8: int):
    """Backward of the dual-activation attention for the TRAINABLE leaves
    (dq_smax, dq_coda, dpos) in ONE pass over K and V per block.

    The global softmax coupling term S[b,h] = Σ_l a_s·da (the only quantity
    that naively forces a second pass over L) collapses to
    0.5·Σ_d g0·o_s — g0 the output cotangent, o_s the forward's normalized
    softmax output, both (B, H, D) — because da = 0.5·(vp·g0) distributes
    through the Σ_l a_s·vp = o_s contraction. The caller computes S in XLA
    from the saved o_s residual and passes it in; the kernel then needs
    only the running (2H+hpad8, HD) gradient accumulators per sample.

    Grid (L-tiles OUTER, samples inner) — same order as the forward's
    batched grid so the shared pos/dpos tile is resident across the inner
    sample sweep. Blocks: qblk (1, HD, 2H) [block-diag q_smax|q_coda],
    qrows (1, 3, HD) f32 [rows: q_smax, q_coda, g0], g0blk (1, HD, H)
    [block-diag g0], stats (1, 3, H) f32 [rows: running max, denominator,
    S], k/v (1, Lt, HD) (or stacked (1, 1, Lt, HD) slot), m (1, Lt, 1),
    pos (Lt, HD). Outputs: dq (1, 2, HD) f32 [rows dq_smax, dq_coda],
    written on the final tile; dpos (Lt, HD) f32 accumulated across the
    inner sample sweep (block index (t, 0): resident in VMEM for the whole
    sweep, flushed when t advances). Scratch: per-sample (2H+hpad8, HD)
    f32 accumulator — rows [0:H) Σ dls^T·kp, [H:2H) Σ dlc^T·kp,
    [2H:2H+hpad8) Σ du^T·sign (head rows padded to an 8-row store).

    Math mirrors ops/decoder_attention_vjp._bwd_math; logits reproduce the
    forward kernel's own arithmetic ((k+pos) @ qblk · scale in the input
    dtype) so exp(ls - mx) consumes the saved stats consistently."""
    t, i = pl.program_id(0), pl.program_id(1)
    hd = heads * head_dim
    if with_pos:
        dq_ref, dpos_ref, accs = rest
    else:
        dq_ref, accs = rest
        dpos_ref = None
    acc = accs.at[i]
    f32 = jnp.float32

    @pl.when(t == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    k = k_ref[0, 0] if stacked_in else k_ref[0]   # (Lt, HD)
    v = v_ref[0, 0] if stacked_in else v_ref[0]
    if with_pos:
        k = k + pos_ref[...]
        v = v + pos_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (lt, 1), 0) + t * lt
    inb = row < l_real
    # Zero out-of-bounds rows of BOTH streams: boundary-tile reads are
    # undefined memory, and a NaN bit pattern would poison every MXU
    # accumulation below even under zero weights (0*NaN=NaN).
    k = jnp.where(inb, k, jnp.zeros((), k.dtype))
    v = jnp.where(inb, v, jnp.zeros((), v.dtype))
    mcol = (m_ref[0] > 0) & inb                   # (Lt, 1)

    mx = stats_ref[0, 0:1, :]                     # (1, H) f32
    denom = stats_ref[0, 1:2, :]
    S = stats_ref[0, 2:3, :]

    # logits for both activations — same single MXU issue as the forward
    logits = jax.lax.dot_general(
        k, qblk_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * scale                                      # (Lt, 2H)
    ls = logits[:, :heads]
    lc = logits[:, heads:]
    p = jnp.where(mcol, jnp.exp(ls - mx), 0.0)    # (Lt, H)
    a_s = p * (1.0 / jnp.maximum(denom, 1e-30))
    tnh = jnp.tanh(lc)

    col_head = jax.lax.broadcasted_iota(jnp.int32, (heads, hd), 1) // head_dim
    row_head = jax.lax.broadcasted_iota(jnp.int32, (heads, hd), 0)
    E = (col_head == row_head).astype(f32)

    qc_row = qrows_ref[0, 1:2, :]                 # (1, HD) f32
    diff = qc_row - k.astype(f32)                 # (Lt, HD)
    l1 = jax.lax.dot_general(
        jnp.abs(diff), E, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )                                             # (Lt, H)
    g_un = 2.0 * jax.nn.sigmoid(-l1 * scale)
    gate = jnp.where(mcol, g_un, 0.0)

    # da = 0.5 * (g0 · vp) per head — one MXU issue on the block-diag g0
    w = jax.lax.dot_general(
        v, g0blk_ref[0], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )                                             # (Lt, H)
    da = 0.5 * w
    dls = jnp.where(mcol, a_s * (da - S), 0.0)
    dlc = jnp.where(mcol, da * gate * (1.0 - tnh * tnh), 0.0)
    du = jnp.where(mcol, -scale * (da * tnh) * g_un * (1.0 - 0.5 * g_un), 0.0)

    cd = k.dtype
    sign = jnp.sign(diff)                         # (Lt, HD) f32
    # accumulate Σ_l dls^T·kp / dlc^T·kp (one issue) and du^T·sign
    g_sc = jax.lax.dot_general(
        jnp.concatenate([dls, dlc], axis=1).astype(cd), k,
        (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                             # (2H, HD)
    dup = jnp.concatenate(
        [du, jnp.zeros((lt, hpad8 - heads), f32)], axis=1)
    g_u = jax.lax.dot_general(
        dup, sign, (((0,), (0,)), ((), ())), preferred_element_type=f32,
    )                                             # (hpad8, HD)
    acc[0:2 * heads, :] = acc[0:2 * heads, :] + g_sc
    acc[2 * heads:, :] = acc[2 * heads:, :] + g_u

    if with_pos:
        # dpos tile = Σ_b dkp + dvp, accumulated across the inner sweep
        @pl.when(i == 0)
        def _():
            dpos_ref[...] = jnp.zeros_like(dpos_ref)

        qs_row = qrows_ref[0, 0:1, :]
        g0_row = qrows_ref[0, 2:3, :]
        avt = jnp.where(mcol, 0.5 * (a_s + tnh * gate), 0.0)
        # four head->HD-lane expansions (each term carries its own
        # multiplier, so they cannot share one concatenated E issue)
        dls_hd = jax.lax.dot_general(dls, E, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        dlc_hd = jax.lax.dot_general(dlc, E, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        du_hd = jax.lax.dot_general(du, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        avt_hd = jax.lax.dot_general(avt, E, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
        contrib = (dls_hd * (qs_row * scale) + dlc_hd * (qc_row * scale)
                   - du_hd * sign + avt_hd * g0_row)
        dpos_ref[...] = dpos_ref[...] + contrib

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        dqs = scale * jnp.sum(acc[0:heads, :] * E, axis=0, keepdims=True)
        dqc = (scale * jnp.sum(acc[heads:2 * heads, :] * E, axis=0,
                               keepdims=True)
               + jnp.sum(acc[2 * heads:2 * heads + heads, :] * E, axis=0,
                         keepdims=True))
        dq_ref[0] = jnp.concatenate([dqs, dqc], axis=0)  # (2, HD)


def fused_decoder_attention_bwd(
    q_smax: jax.Array,
    q_coda: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    temporal_pos: jax.Array | None,
    layer: int | None,
    denom: jax.Array,
    mx: jax.Array,
    o_s: jax.Array,
    ct: jax.Array,
):
    """Pallas backward for the trainable decoder-attention leaves.

    Returns (dq_smax (B,1,H,D), dq_coda (B,1,H,D), dpos (L,H,D) f32 or
    None). Consumes K/V in their export layout — no relayout copies (the
    XLA backward's batched dots force a tokens-minor relayout of the whole
    merged K/V stream, ~6.9 ms/step at flagship train shapes; round-5
    train budget in PERF.md). dK/dV (adapter paths) stay with the XLA
    einsums in decoder_attention_vjp._bwd_math — dead code the jit DCEs on
    the frozen-encoder path.

    denom/mx: saved softmax stats (B, H) f32. o_s: the forward's
    normalized softmax-branch output (B, H, D) f32 — S = 0.5·Σ_d g0·o_s
    (see _bwd_kernel). ct: output cotangent (B, 1, H, D)."""
    b, _, h, d = q_smax.shape
    stacked_in = layer is not None
    l = k.shape[2] if stacked_in else k.shape[1]
    hd = h * d
    scale = d ** -0.5
    lt = _pick_tile(l)
    n_tiles = -(-l // lt)
    cd = jnp.bfloat16 if k.dtype == jnp.int8 else k.dtype
    f32 = jnp.float32
    hpad8 = -(-h // 8) * 8

    if stacked_in:
        nblk = k.shape[0]
        kf = k.reshape(nblk, b, l, hd)
        vf = v.reshape(nblk, b, l, hd)
        kv_spec = pl.BlockSpec(
            (1, 1, lt, hd), lambda t, i, _layer=layer: (_layer, i, t, 0),
            memory_space=pltpu.VMEM)
    else:
        kf = k.reshape(b, l, hd)
        vf = v.reshape(b, l, hd)
        kv_spec = pl.BlockSpec((1, lt, hd), lambda t, i: (i, t, 0),
                               memory_space=pltpu.VMEM)
    mf = mask.astype(jnp.int32)[..., None]

    with_pos = temporal_pos is not None
    if with_pos:
        pos = jnp.broadcast_to(temporal_pos, (l, h, d)).reshape(l, hd).astype(cd)
        pos_index = lambda t, i: (t, 0)  # noqa: E731
    else:
        pos = jnp.zeros((lt, hd), cd)
        pos_index = lambda t, i: (0, 0)  # noqa: E731

    g0 = ct[:, 0].astype(f32)                               # (B, H, D)
    eye = jnp.eye(h, dtype=cd)
    qs_blk = (q_smax[:, 0].astype(cd)[..., None] * eye[None, :, None, :]).reshape(b, hd, h)
    qc_blk = (q_coda[:, 0].astype(cd)[..., None] * eye[None, :, None, :]).reshape(b, hd, h)
    qblk = jnp.concatenate([qs_blk, qc_blk], axis=2)        # (B, HD, 2H)
    g0blk = (g0.astype(cd)[..., None] * eye[None, :, None, :]).reshape(b, hd, h)
    qrows = jnp.stack(
        [q_smax[:, 0].reshape(b, hd).astype(f32),
         q_coda[:, 0].reshape(b, hd).astype(f32),
         g0.reshape(b, hd)], axis=1)                        # (B, 3, HD) f32
    S = 0.5 * jnp.einsum("bhd,bhd->bh", g0, o_s.astype(f32))
    stats = jnp.stack([mx.astype(f32), denom.astype(f32), S], axis=1)

    kernel = functools.partial(
        _bwd_kernel, heads=h, head_dim=d, scale=scale, l_real=l, lt=lt,
        with_pos=with_pos, stacked_in=stacked_in, hpad8=hpad8,
    )
    out_shape = [jax.ShapeDtypeStruct((b, 2, hd), f32)]
    out_specs = [pl.BlockSpec((1, 2, hd), lambda t, i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if with_pos:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles * lt, hd), f32))
        out_specs.append(pl.BlockSpec((lt, hd), lambda t, i: (t, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(n_tiles, b),
        in_specs=[
            pl.BlockSpec((1, hd, 2 * h), lambda t, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, hd), lambda t, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, h), lambda t, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, h), lambda t, i: (i, 0, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, lt, 1), lambda t, i: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lt, hd), pos_index, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((b, 2 * h + hpad8, hd), f32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(qblk, qrows, g0blk, stats, kf, vf, mf, pos)
    dq = outs[0]
    dqs = dq[:, 0].reshape(b, 1, h, d)
    dqc = dq[:, 1].reshape(b, 1, h, d)
    dpos = outs[1][:l].reshape(l, h, d) if with_pos else None
    return dqs, dqc, dpos


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
