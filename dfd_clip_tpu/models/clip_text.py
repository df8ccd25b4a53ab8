"""CLIP text tower and zero-shot scoring surface.

Re-architects /root/reference/src/clip/model.py:229-294 (Transformer with a
causal attn_mask) and :397-412 (CLIP.encode_text: token embedding +
positional, causal transformer, ln_final, EOT-argmax pooling through
text_projection), plus :386-395 (encode_image's pooled path: ln_post on the
CLS row @ proj) — the halves of CLIP the deepfake pipeline itself never
calls but the upstream repo ships. TPU-native shape: a pure function over a
nested-dict pytree whose blocks are stacked for ``lax.scan`` (one compiled
block body, no Python-unrolled 12-layer graph), bf16-friendly, with the
causal mask added as a (1, 1, L, L) additive bias so XLA fuses it into the
logits.

The tokenizer lives in data/tokenizer.py; weights load through
models/weights.py:convert_clip_text from the same OpenAI checkpoints as the
visual tower (place them under misc/ — no network egress here).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from . import layers

Params = Dict[str, Any]


@dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


ARCHITECTURES: Dict[str, TextConfig] = {
    # pairs with the visual ViT-B/16 (embed_dim 512)
    "ViT-B/16": TextConfig(),
    "ViT-L/14": TextConfig(width=768, heads=12, embed_dim=768),
    # tiny geometry for tests (mirrors clip_vit's "ViT-Test")
    "Text-Test": TextConfig(context_length=12, vocab_size=64, width=32,
                            heads=4, layers=2, embed_dim=16),
}


def init_clip_text(key: jax.Array, cfg: TextConfig) -> Params:
    keys = jax.random.split(key, 4)
    w = cfg.width
    scale = w ** -0.5
    attn_std = scale * (2 * cfg.layers) ** -0.5

    def init_block(k: jax.Array) -> Params:
        ks = jax.random.split(k, 4)
        return {
            "ln_1": layers.init_layer_norm(w),
            "attn": {
                "in_proj": layers.init_linear(ks[0], w, 3 * w, std=attn_std),
                "out_proj": layers.init_linear(ks[1], w, w, std=attn_std),
            },
            "ln_2": layers.init_layer_norm(w),
            "mlp": {
                "c_fc": layers.init_linear(ks[2], w, 4 * w, std=scale),
                "c_proj": layers.init_linear(ks[3], 4 * w, w, std=scale),
            },
        }

    block_keys = jax.random.split(keys[3], cfg.layers)
    blocks = [init_block(k) for k in block_keys]
    return {
        "token_embedding": 0.02
        * jax.random.normal(keys[0], (cfg.vocab_size, w), jnp.float32),
        "positional_embedding": 0.01
        * jax.random.normal(keys[1], (cfg.context_length, w), jnp.float32),
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "ln_final": layers.init_layer_norm(w),
        "text_projection": scale
        * jax.random.normal(keys[2], (w, cfg.embed_dim), jnp.float32),
        "logit_scale": jnp.asarray(2.6592, jnp.float32),  # ln(1/0.07), CLIP init
    }


def _causal_block(h: jax.Array, bp: Params, cfg: TextConfig, bias: jax.Array):
    """One pre-LN transformer block with causally-masked attention —
    the lax.scan body (src/clip/model.py:211-227 semantics)."""
    b, l, w = h.shape
    y = layers.layer_norm(bp["ln_1"], h)
    qkv = layers.linear(bp["attn"]["in_proj"], y)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split = lambda a: a.reshape(b, l, cfg.heads, cfg.head_dim)
    logits = jnp.einsum(
        "blhd,bmhd->bhlm", split(q), split(k),
        preferred_element_type=jnp.float32,
    ) * (cfg.head_dim ** -0.5) + bias
    att = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
    o = jnp.einsum("bhlm,bmhd->blhd", att, split(v)).reshape(b, l, w)
    h = h + layers.linear(bp["attn"]["out_proj"], o)
    y2 = layers.layer_norm(bp["ln_2"], h)
    mid = layers.quick_gelu(layers.linear(bp["mlp"]["c_fc"], y2))
    return h + layers.linear(bp["mlp"]["c_proj"], mid), None


def clip_text_encode(
    params: Params,
    tokens: jax.Array,
    cfg: TextConfig,
    compute_dtype=jnp.float32,
    normalize: bool = False,
    causal: bool = True,
) -> jax.Array:
    """(B, L) int tokens -> (B, embed_dim) text features.

    EOT pooling follows the reference exactly: the feature row is taken at
    ``argmax(tokens)`` — EOT has the highest id in the vocabulary, and
    padding is 0 (src/clip/model.py:406-410).

    ``causal`` defaults to original-CLIP semantics (build_attention_mask,
    src/clip/model.py:382-388) — which REAL OpenAI checkpoints were trained
    with. Note the reference's vendored copy silently lost the mask: its
    rewritten MultiheadAttention discards attn_mask (model.py:185) and
    encode_text permutes to length-first before batch-first attention
    (model.py:401-405) — dead code there, re-architected functional here.
    ``causal=False`` reproduces the vendored blocks' literal (unmasked)
    math for the torch-golden parity test."""
    b, l = tokens.shape
    h = jnp.take(params["token_embedding"], tokens, axis=0)
    h = (h + params["positional_embedding"][:l]).astype(compute_dtype)
    if causal:
        bias = jnp.where(
            jnp.tril(jnp.ones((l, l), bool)), 0.0, -jnp.inf
        ).astype(jnp.float32)[None, None]
    else:
        bias = jnp.float32(0.0)
    h, _ = jax.lax.scan(
        lambda carry, bp: _causal_block(carry, bp, cfg, bias),
        h, params["blocks"],
    )
    x = layers.layer_norm(params["ln_final"], h)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    feats = (pooled @ params["text_projection"].astype(compute_dtype))
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def clip_vision_features(
    params: Params,
    x: jax.Array,
    cfg,
    compute_dtype=jnp.float32,
    normalize: bool = False,
) -> jax.Array:
    """(B, 3, H, W) -> (B, embed_dim) pooled image features: the reference
    VisionTransformer's own forward (ln_post on the CLS row @ proj,
    src/clip/model.py:279-294) — the zero-shot counterpart of
    clip_vit.clip_vision_kv's K/V export. Requires a converter-loaded param
    tree carrying ln_post/proj (init_clip_vision omits them; the detector
    never uses this path)."""
    from . import clip_vit

    h = clip_vit.embed_patches(params, x, cfg, compute_dtype)
    # visual blocks share the text blocks' structure exactly (pre-LN,
    # QuickGELU MLP) with no mask: reuse the scan body with a zero bias.
    # ViTConfig duck-types TextConfig here (heads/head_dim are all it uses).
    h, _ = jax.lax.scan(
        lambda carry, bp: _causal_block(carry, bp, cfg, jnp.float32(0.0)),
        h, params["blocks"],
    )
    pooled = layers.layer_norm(params["ln_post"], h[:, 0])
    feats = pooled @ params["proj"].astype(compute_dtype)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def zero_shot_logits(image_feats: jax.Array, text_feats: jax.Array,
                     logit_scale: jax.Array) -> jax.Array:
    """Cosine-similarity logits, (B_img, B_txt) — CLIP.forward's pairing
    (src/clip/model.py:414-427)."""
    img = image_feats / jnp.linalg.norm(image_feats, axis=-1, keepdims=True)
    txt = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)
    return jnp.exp(logit_scale) * img @ txt.T
