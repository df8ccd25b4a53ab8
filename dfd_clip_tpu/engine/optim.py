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


def build_optimizer(spec: Dict, schedule: Callable) -> optax.GradientTransformation:
    name = spec["name"]
    wd = spec.get("weight_decay", 0.0)
    if name == "sgd":
        # torch SGD couples weight decay into the gradient before momentum.
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.sgd(schedule, momentum=0.95),
        )
    if name == "adamw":
        return optax.adamw(schedule, weight_decay=wd)
    raise NotImplementedError(f"Unknown optimizer: {name}")
