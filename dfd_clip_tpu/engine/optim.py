"""Optimizers and LR schedules via optax.

Mirrors the reference's optimizer surface (src/models.py:740-754: SGD with
momentum 0.95 / AdamW, weight decay on every trainable param) and the
OneCycle schedule (src/trainer.py:55-62: torch OneCycleLR defaults —
cosine anneal, pct_start 0.3, div_factor 25, final_div_factor 1e4, total
steps scaled by world size; the optimizer's base LR is max_lr/25).
"""

from __future__ import annotations

from typing import Callable, Dict

import optax


def one_cycle_schedule(max_lr: float, total_steps: int) -> Callable:
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=0.3,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def _decay_mask(params):
    """Weight decay applies to every trainable param (reference semantics)
    EXCEPT BatchNorm running statistics: torch keeps those as buffers the
    optimizer never sees, but here they live inside the adapter's param
    pytree (models/adapter.py 768-bn) — decaying them would corrupt the
    stored eval-time mean/var."""
    import jax

    def mask_leaf(path, _leaf):
        keys = [getattr(k, "key", None) for k in path]
        return not ("bn" in keys and keys[-1] in ("mean", "var"))

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def build_optimizer(spec: Dict, schedule: Callable) -> optax.GradientTransformation:
    name = spec["name"]
    wd = spec.get("weight_decay", 0.0)
    if name == "sgd":
        # torch SGD couples weight decay into the gradient before momentum.
        return optax.chain(
            optax.add_decayed_weights(wd, mask=_decay_mask),
            optax.sgd(schedule, momentum=0.95),
        )
    if name == "adamw":
        return optax.adamw(schedule, weight_decay=wd, mask=_decay_mask)
    raise NotImplementedError(f"Unknown optimizer: {name}")
