"""Temporal cross-attention decoder.

Re-architecture of the reference Decoder (/root/reference/src/models.py:272-361):
a learned CLS query cross-attends the per-layer K/V streams exported by the
frozen encoder. Per kept encoder layer there is one residual block whose
LayerNorms and MLP are *initialized from the frozen encoder's weights at that
layer* (src/models.py:178-229). A shared temporal positional embedding is
added to both K and V (same embedding for every patch of a frame), K/V are
flattened over (frames, patches), and the per-block outputs are concatenated.

Supported op_mode flags (src/models.py:105-115, 250-269, 307-321, 326-329):
  temporal_position, attn_mode ("frame"/"temporal"), aug_query,
  global_prediction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import layers
from ..ops.decoder_attention import dual_activation_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    width: int
    heads: int
    num_frames: int
    layer_indices: Tuple[int, ...]
    out_dims: Tuple[int, ...]
    dropout: float = 0.0
    temporal_position: bool = True
    attn_mode: Tuple[str, ...] = ()
    aug_query: bool = False
    global_prediction: bool = False
    concat_ref: bool = False

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def num_blocks(self) -> int:
        return len(self.layer_indices)


def _init_block(key: jax.Array, width: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "ln_1": layers.init_layer_norm(width),
        # in_proj emits one query per activation (softmax + CoDA): 2x width.
        "attn": {
            "in_proj": layers.init_linear(ks[0], width, 2 * width),
            "out_proj": layers.init_linear(ks[1], width, width),
        },
        "ln_2": layers.init_layer_norm(width),
        "mlp": {
            "c_fc": layers.init_linear(ks[2], width, 4 * width),
            "c_proj": layers.init_linear(ks[3], 4 * width, width),
        },
    }


def _reference_block_params(encoder_blocks: Params, layer: int) -> Params:
    """Slice one encoder block's ln/mlp params out of the scan-stacked pytree."""
    return jax.tree_util.tree_map(lambda x: x[layer], encoder_blocks)


def init_decoder(
    key: jax.Array,
    cfg: DecoderConfig,
    encoder_blocks: Optional[Params] = None,
) -> Params:
    """Initialize decoder params; ln_1/ln_2/mlp seeded from the encoder.

    ``encoder_blocks`` is the frozen encoder's stacked block pytree
    (clip_vit params["blocks"]); when given, block i copies the LayerNorm and
    MLP weights of encoder layer ``layer_indices[i]`` — with the concat_ref
    stagger copying the *next* kept layer's preceding MLP
    (src/models.py:216-229).
    """
    n = cfg.num_blocks
    keys = jax.random.split(key, n + 3)
    scale = cfg.width ** -0.5

    blocks: List[Params] = []
    for i in range(n):
        blk = _init_block(keys[i], cfg.width)
        if encoder_blocks is not None:
            current = cfg.layer_indices[i]
            ref = _reference_block_params(encoder_blocks, current)
            blk["ln_1"] = jax.tree_util.tree_map(jnp.array, ref["ln_1"])
            blk["ln_2"] = jax.tree_util.tree_map(jnp.array, ref["ln_2"])
            if cfg.concat_ref and i < n - 1:
                mlp_ref = _reference_block_params(
                    encoder_blocks, cfg.layer_indices[i + 1] - 1
                )["mlp"]
            else:
                mlp_ref = ref["mlp"]
            # SwiGLU encoders (dinov2 giant2) have no c_fc/c_proj to seed the
            # decoder's GELU MLP with; keep the random init. (The reference
            # cannot build this combination at all: its Decoder hard-loads
            # c_fc/c_proj, and its detector only ever builds mlp-FFN towers.)
            if "c_fc" in mlp_ref:
                blk["mlp"] = jax.tree_util.tree_map(jnp.array, mlp_ref)
        blocks.append(blk)

    params: Params = {
        "class_embedding": scale * jax.random.normal(keys[n], (cfg.width,), jnp.float32),
        "ln_pre": layers.init_layer_norm(cfg.width),
        "ln_post": layers.init_layer_norm(cfg.width),
        "blocks": blocks,
    }
    if cfg.temporal_position:
        params["positional_embedding"] = scale * jax.random.normal(
            keys[n + 1], (cfg.num_frames, 1, cfg.heads, cfg.head_dim), jnp.float32
        )
    if cfg.aug_query:
        params["aug_query"] = jnp.zeros((n - 1, cfg.width), jnp.float32)

    proj_keys = jax.random.split(keys[n + 2], len(cfg.out_dims))
    task_projections: List[List[jax.Array]] = []
    for t, out_dim in enumerate(cfg.out_dims):
        n_mats = n if cfg.global_prediction else 1
        mats = [
            scale
            * jax.random.normal(
                jax.random.fold_in(proj_keys[t], j), (cfg.width, out_dim), jnp.float32
            )
            for j in range(n_mats)
        ]
        task_projections.append(mats)
    params["task_projections"] = task_projections
    return params


def apply_decoder(
    params: Params,
    kvs: Dict[str, jax.Array],
    m: jax.Array,
    cfg: DecoderConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    patch_valid: Optional[int] = None,
) -> Tuple[List[jax.Array], jax.Array]:
    """Decode per-layer K/V into task logits.

    Args:
      kvs: {"k": (Lsel, B, T, P, H, D), "v": same} — selected encoder layers.
      m: (B, T) bool frame-validity mask.
      patch_valid: with a tile-aligned (padded) K/V export, the count of
        REAL patches per frame — tokens at patch index >= patch_valid are
        zero pad rows, masked as keys here (clip_vit.clip_vision_kv
        pad_tokens). None (or >= P): every patch is real.

    Returns: (task_logits list [(B, out_dim)], video_feature).
    """
    k_all, v_all = kvs["k"], kvs["v"]
    nsel, b, t, p, h, d = k_all.shape
    assert nsel == cfg.num_blocks
    # op_mode.kv_dtype="int8_rows": K/V arrive quantized with per-row scales;
    # the Pallas kernel dequantizes per tile in VMEM, the XLA path at the
    # slot slice. Compute dtype for queries/residual comes from the scales'
    # presence, not k_all.dtype (int8).
    ks_all = kvs.get("k_scale")
    vs_all = kvs.get("v_scale")
    cd = jnp.bfloat16 if k_all.dtype == jnp.int8 else k_all.dtype

    # Shared temporal positional embedding for both K and V (same embedding
    # for every patch of a frame), sliced to the actual frame count:
    # op_mode.ema_frame collapses T to 1 (the reference requires
    # temporal_position=0 there; slicing generalizes). It is THREADED into
    # the attention op rather than pre-added: the Pallas path applies it
    # in-VMEM, the XLA path adds it where fusion makes it free.
    pos_tok = None
    if cfg.temporal_position:
        pos = params["positional_embedding"][:t]  # (T, 1, H, D)
        pos_tok = jnp.broadcast_to(pos, (t, p, h, d)).reshape(t * p, h, d)

    # Flatten (T, P) -> L tokens; expand frame mask to token mask. With a
    # tile-aligned export (P % 8 == 0) these reshapes are layout bitcasts;
    # at P=196 each materializes a full K/V copy (~1.78 ms/batch on v5e).
    k_all = k_all.reshape(nsel, b, t * p, h, d)
    v_all = v_all.reshape(nsel, b, t * p, h, d)
    if ks_all is not None:
        ks_all = ks_all.reshape(nsel, b, t * p, 1)
        vs_all = vs_all.reshape(nsel, b, t * p, 1)
    if patch_valid is not None and patch_valid < p:
        # mask the per-frame zero pad rows of the aligned export as keys
        pv = jnp.arange(p) < patch_valid  # (P,)
        token_mask = (m[:, :, None] & pv[None, None, :]).reshape(b, t * p)
    else:
        token_mask = jnp.repeat(m, p, axis=-1)  # (B, T*P)

    def next_rng():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    x = jnp.broadcast_to(
        params["class_embedding"].astype(cd), (b, 1, cfg.width)
    )
    x = layers.layer_norm(params["ln_pre"], x)
    x = layers.dropout(x, cfg.dropout, next_rng(), train)

    # Per-device inference (single-device TPU, or a shard_map-local body —
    # ops.attention.per_device_pallas): run the per-block interstitial
    # (out-proj + residual + LN2 + MLP + next block's LN1 + query in-proj)
    # as ONE Pallas boundary kernel per block instead of ~12 XLA ops — the
    # whole decoder becomes back-to-back Pallas calls
    # (ops/pallas_decoder_stack.py). Training differentiates the XLA
    # composition; aug_query reorders the query input and keeps the XLA path.
    import os as _os

    _stack_env = _os.environ.get("DFD_DEC_STACK", "1")
    use_stack = (
        _stack_env != "0"
        and not train
        and not cfg.attn_mode
        and not cfg.aug_query
        and _os.environ.get("DFD_ATTENTION_BACKEND", "auto") != "xla"
    )
    if use_stack and _stack_env != "force":
        from ..ops import attention as attention_ops

        use_stack = attention_ops.per_device_pallas()

    results = []
    if use_stack:
        from ..ops.pallas_decoder_stack import decoder_boundary

        blocks = params["blocks"]
        qp = lambda blk: {"ln_1": blk["ln_1"], "in_proj": blk["attn"]["in_proj"]}
        x2d = x[:, 0]  # (B, W)
        _, qrow = decoder_boundary(x2d, None, None, qp(blocks[0]))
        for i, blk in enumerate(blocks):
            q_smax = qrow[:, : cfg.width].reshape(b, 1, h, d)
            q_coda = qrow[:, cfg.width :].reshape(b, 1, h, d)
            attn_out = dual_activation_attention(
                q_smax, q_coda, k_all, v_all, token_mask,
                num_frames=t, attn_mode=cfg.attn_mode, temporal_pos=pos_tok,
                layer=i, differentiable=False,
                k_scale=ks_all, v_scale=vs_all,
            )
            nxt = qp(blocks[i + 1]) if i + 1 < len(blocks) else None
            x2d, qrow = decoder_boundary(
                x2d, attn_out.reshape(b, cfg.width),
                {"attn_out_proj": blk["attn"]["out_proj"],
                 "ln_2": blk["ln_2"], "mlp": blk["mlp"]},
                nxt,
            )
            results.append(x2d[:, None])
        x = x2d[:, None]
    else:
        for i, blk in enumerate(params["blocks"]):
            q_in = layers.layer_norm(blk["ln_1"], x)
            qs = layers.linear(blk["attn"]["in_proj"], q_in)
            q_smax, q_coda = jnp.split(qs, 2, axis=-1)
            q_smax = q_smax.reshape(b, -1, h, d)
            q_coda = q_coda.reshape(b, -1, h, d)
            attn_out = dual_activation_attention(
                q_smax, q_coda, k_all, v_all, token_mask,
                num_frames=t, attn_mode=cfg.attn_mode, temporal_pos=pos_tok,
                layer=i, differentiable=train,
                k_scale=ks_all, v_scale=vs_all,
            )
            attn_out = layers.linear(blk["attn"]["out_proj"], attn_out.reshape(b, -1, cfg.width))
            x = x + attn_out
            y = layers.layer_norm(blk["ln_2"], x)
            y = layers.linear(blk["mlp"]["c_fc"], y)
            y = layers.quick_gelu(y)
            y = layers.dropout(y, cfg.dropout, next_rng(), train)
            y = layers.linear(blk["mlp"]["c_proj"], y)
            x = x + y
            results.append(x)
            if cfg.aug_query and i < cfg.num_blocks - 1:
                x = x + params["aug_query"][i].astype(x.dtype)

    feats = jnp.concatenate(results, axis=1)  # (B, num_blocks, W)

    if not cfg.global_prediction:
        feats = feats[:, -1]  # (B, W)
    feats = layers.layer_norm(params["ln_post"], feats)
    feats = layers.dropout(feats, cfg.dropout, next_rng(), train)
    video_feature = feats.astype(jnp.float32)

    task_logits: List[jax.Array] = []
    if cfg.global_prediction:
        n = cfg.num_blocks
        denom = (1 + n) * n / 2.0  # depth-weighted average (src/models.py:345-357)
        for mats in params["task_projections"]:
            logit = sum(
                (video_feature[:, i] @ mats[i]) * ((i + 1) / denom)
                for i in range(n)
            )
            task_logits.append(logit)
    else:
        for mats in params["task_projections"]:
            task_logits.append(video_feature @ mats[-1])

    return task_logits, video_feature
