"""Cosine schedules + layerwise-decay parameter groups.

Equivalents of dinov2/train/train.py:66-111 (lr/wd/momentum/teacher-temp
cosine schedulers with warmup and freeze windows) and
dinov2/utils/param_groups.py:14-96 (layerwise LR decay, no weight decay for
norms/biases, patch-embed LR multiplier) — expressed as optax transforms.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax


def cosine_with_warmup(
    base: float,
    final: float,
    total_steps: int,
    warmup_steps: int = 0,
    start: float = 0.0,
    freeze_steps: int = 0,
) -> Callable:
    """Linear warmup -> cosine decay, optionally frozen at 0 first."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start + (base - start) * step / jnp.maximum(warmup_steps, 1)
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        progress = jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)
        cos = final + 0.5 * (base - final) * (1 + jnp.cos(jnp.pi * progress))
        value = jnp.where(step < warmup_steps, warm, cos)
        return jnp.where(step < freeze_steps, 0.0, value)

    return schedule


def sqrt_lr_scaling(base_lr: float, global_batch: int) -> float:
    """The reference's sqrt LR rule (dinov2/utils/config.py:23-31)."""
    return base_lr * float(np.sqrt(global_batch / 1024.0))


def _param_labels(params: Dict[str, Any], n_layers: int) -> Dict[str, Any]:
    """Label each leaf with (depth_bucket, is_no_decay, is_patch_embed)."""

    def label_tree(tree, path=()):
        out = {}
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                out[k] = label_tree(v, p)
            elif isinstance(v, list):
                out[k] = [
                    label_tree(item, p + (str(i),)) if isinstance(item, dict)
                    else _leaf_label(p + (str(i),), v=item, n_layers=n_layers)
                    for i, item in enumerate(v)
                ]
            else:
                out[k] = _leaf_label(p, v, n_layers)
        return out

    return label_tree(params)


def _leaf_label(path, v, n_layers):
    names = [str(p) for p in path]
    depth = 0  # 0 = embeddings, 1..n = blocks, n+1 = head
    if "blocks" in names:
        depth = 1  # refined at runtime per stacked leading axis — bucket all blocks
    if any(n in names for n in ("ln_post", "head", "dino_head", "ibot_head")):
        depth = 2
    no_decay = (
        any(n.startswith("ln") or n in ("scale", "bias", "b", "ls1", "ls2") for n in names)
        or (hasattr(v, "ndim") and v.ndim <= 1)
    )
    patch_embed = "conv1" in names or "positional_embedding" in names
    return (depth, bool(no_decay), bool(patch_embed))


def _scheduled_decay(wd_schedule: Callable, mask) -> optax.GradientTransformation:
    """add wd(step) * p to the (pre-LR) updates of masked leaves."""

    def init(params):
        del params
        return {"count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params):
        wd = wd_schedule(state["count"])
        updates = jax.tree_util.tree_map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask
        )
        return updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def _layerwise_scale(labels, n_layers: int, layerwise_decay: float,
                     patch_embed_lr_mult: float) -> optax.GradientTransformation:
    """Per-leaf LR multipliers: depth buckets + per-stacked-block decay."""
    block_decay = jnp.asarray(
        [layerwise_decay ** (n_layers - i) for i in range(n_layers)], jnp.float32
    )

    def scale_for(label):
        depth, _, patch_embed = label
        mult = layerwise_decay ** n_layers if depth == 0 else 1.0
        if patch_embed:
            mult *= patch_embed_lr_mult
        return mult

    def update(updates, state, params=None):
        del params

        def walk(u_tree, l_tree, in_blocks=False):
            out = {}
            for k in u_tree:
                u, l = u_tree[k], l_tree[k]
                blocks_here = in_blocks or k == "blocks"
                if isinstance(u, dict):
                    out[k] = walk(u, l, blocks_here)
                elif isinstance(u, list):
                    out[k] = [
                        walk(ui, li, blocks_here) if isinstance(ui, dict)
                        else ui * scale_for(li)
                        for ui, li in zip(u, l)
                    ]
                else:
                    scaled = u * scale_for(l)
                    if (blocks_here and hasattr(u, "shape") and u.ndim >= 1
                            and u.shape[0] == n_layers):
                        bshape = (n_layers,) + (1,) * (u.ndim - 1)
                        scaled = scaled * block_decay.reshape(bshape)
                    out[k] = scaled
            return out

        return walk(updates, labels), state

    return optax.GradientTransformation(lambda p: optax.EmptyState(), update)


def build_ssl_optimizer(
    params: Dict[str, Any],
    lr_schedule: Callable,
    wd_schedule: Callable,
    n_layers: int,
    layerwise_decay: float = 0.9,
    patch_embed_lr_mult: float = 0.2,
    betas=(0.9, 0.999),
    clip_norm: float = 3.0,
) -> optax.GradientTransformation:
    """AdamW with scheduled wd, layerwise-decay LR buckets and patch-embed LR
    multiplier. Blocks are lax.scan-stacked, so per-block decay is a
    per-layer scale vector folded into the stacked update."""
    labels = _param_labels(params, n_layers)
    decay_mask = jax.tree_util.tree_map(
        lambda l: not l[1], labels, is_leaf=lambda x: isinstance(x, tuple)
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        _scheduled_decay(wd_schedule, decay_mask),
        _layerwise_scale(labels, n_layers, layerwise_decay, patch_embed_lr_mult),
        optax.scale_by_learning_rate(lr_schedule),
    )
