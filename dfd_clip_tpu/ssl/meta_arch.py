"""SSL meta-architecture: student/teacher DINOv2 with DINO+iBOT+KoLeo.

Behavioral equivalent of dinov2/train/ssl_meta_arch.py:34-403, TPU-native:
instead of FSDP-wrapped torch modules with manual resharding, the student
and teacher are parameter pytrees in one jitted step; the teacher momentum
update runs as a fused tree_map (the reference uses torch._foreach_* over
flat params, ssl_meta_arch.py:359-368); cross-replica loss centering is an
XLA collective via the sharded batch mean.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import dinov2_vit
from ..models.clip_vit import ViTConfig
from . import losses as loss_lib
from .dino_head import apply_dino_head, init_dino_head

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SSLConfig:
    arch: ViTConfig
    out_dim: int = 65536
    ibot_out_dim: int = 65536
    ibot_separate_head: bool = True
    local_size: int = 98
    n_local_crops: int = 8
    student_temp: float = 0.1
    center_momentum: float = 0.9
    dino_weight: float = 1.0
    ibot_weight: float = 1.0
    koleo_weight: float = 0.1
    drop_path_rate: float = 0.0
    # rematerialize student tower blocks in backward (HBM for FLOPs trade;
    # see models/dinov2_vit.dinov2_forward)
    remat: bool = False
    head_hidden_dim: int = 2048
    head_bottleneck_dim: int = 256
    head_n_layers: int = 3
    # teacher-distribution normalization: "centering" (EMA-centered softmax)
    # or "sinkhorn_knopp" (dinov2 ssl_default_config.yaml:70,
    # ssl_meta_arch.py:202-230 selection)
    centering: str = "centering"


class SSLMetaArch:
    def __init__(self, cfg: SSLConfig, compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.compute_dtype = compute_dtype

    def init_params(self, key: jax.Array) -> Tuple[Params, Params, Params]:
        """Returns (student, teacher, centers)."""
        kb, kd, ki = jax.random.split(key, 3)
        c = self.cfg
        student: Params = {
            "backbone": dinov2_vit.init_dinov2(kb, c.arch),
            "dino_head": init_dino_head(
                kd, c.arch.width, c.out_dim, c.head_hidden_dim,
                c.head_bottleneck_dim, c.head_n_layers,
            ),
        }
        if c.ibot_separate_head:
            student["ibot_head"] = init_dino_head(
                ki, c.arch.width, c.ibot_out_dim, c.head_hidden_dim,
                c.head_bottleneck_dim, c.head_n_layers,
            )
        teacher = jax.tree_util.tree_map(jnp.copy, student)
        centers = {
            "dino": jnp.zeros((c.out_dim,), jnp.float32),
            "ibot": jnp.zeros((c.ibot_out_dim,), jnp.float32),
        }
        return student, teacher, centers

    def _ibot_head(self, params: Params):
        return params["ibot_head"] if self.cfg.ibot_separate_head else params["dino_head"]

    def forward_loss(
        self,
        student: Params,
        teacher: Params,
        centers: Params,
        global_crops: jax.Array,   # (2, B, 3, S, S)
        local_crops: Optional[jax.Array],  # (n_local, B, 3, s, s) or None
        patch_masks: jax.Array,    # (2, B, P) bool — per global crop
        teacher_temp: jax.Array,
        rng: Optional[jax.Array] = None,
    ):
        """One SSL loss evaluation. Returns (total_loss, (metrics, new_centers))."""
        c = self.cfg
        rng_g = rng_l = None
        if rng is not None:
            rng_g, rng_l = jax.random.split(rng)
        two, b = global_crops.shape[:2]
        flat_globals = global_crops.reshape((two * b,) + global_crops.shape[2:])

        # teacher on clean global crops (stop-gradient by construction)
        t_out = dinov2_vit.dinov2_forward(
            teacher["backbone"], flat_globals, c.arch, self.compute_dtype
        )
        t_cls_logits = apply_dino_head(teacher["dino_head"], t_out["cls"])
        t_cls_logits = t_cls_logits.reshape(two, b, -1)
        t_patch_logits = apply_dino_head(
            self._ibot_head(teacher), t_out["patch"]
        ).reshape(two, b, -1, c.ibot_out_dim)
        t_cls_logits = jax.lax.stop_gradient(t_cls_logits)
        t_patch_logits = jax.lax.stop_gradient(t_patch_logits)

        # student on masked global crops (with stochastic depth)
        s_out_g = dinov2_vit.dinov2_forward(
            student["backbone"], flat_globals, c.arch, self.compute_dtype,
            masks=patch_masks.reshape(two * b, -1),
            drop_path_rate=c.drop_path_rate, rng=rng_g, remat=c.remat,
        )
        s_cls_logits_g = apply_dino_head(student["dino_head"], s_out_g["cls"])
        s_cls = [s_cls_logits_g.reshape(two, b, -1)]

        # student on local crops
        if local_crops is not None and local_crops.shape[0] > 0:
            nl = local_crops.shape[0]
            flat_locals = local_crops.reshape((nl * b,) + local_crops.shape[2:])
            s_out_l = dinov2_vit.dinov2_forward(
                student["backbone"], flat_locals, c.arch, self.compute_dtype,
                drop_path_rate=c.drop_path_rate, rng=rng_l, remat=c.remat,
            )
            s_cls.append(
                apply_dino_head(student["dino_head"], s_out_l["cls"]).reshape(nl, b, -1)
            )
        s_cls_logits = jnp.concatenate(s_cls, axis=0)  # (2 + n_local, B, K)

        # teacher-distribution normalization (ssl_meta_arch.py:202-230):
        # softmax-centering uses the EMA center; sinkhorn_knopp computes the
        # assignment directly and leaves the centers untouched.
        t_probs_dino = t_probs_ibot = None
        if c.centering == "sinkhorn_knopp":
            t_probs_dino = loss_lib.sinkhorn_knopp(
                t_cls_logits.reshape(two * b, -1), teacher_temp
            ).reshape(two, b, -1)
            t_probs_ibot = loss_lib.sinkhorn_knopp_masked(
                t_patch_logits.reshape(two * b, -1, c.ibot_out_dim),
                patch_masks.reshape(two * b, -1),
                teacher_temp,
            )
        elif c.centering != "centering":
            raise NotImplementedError(f"centering: {c.centering}")

        dino, dino_center = loss_lib.dino_loss(
            s_cls_logits, t_cls_logits, centers["dino"],
            c.student_temp, teacher_temp, teacher_probs=t_probs_dino,
        )

        s_patch_logits = apply_dino_head(
            self._ibot_head(student), s_out_g["patch"]
        ).reshape(two, b, -1, c.ibot_out_dim)
        ibot, ibot_center = loss_lib.ibot_patch_loss(
            s_patch_logits.reshape(two * b, -1, c.ibot_out_dim),
            t_patch_logits.reshape(two * b, -1, c.ibot_out_dim),
            patch_masks.reshape(two * b, -1),
            centers["ibot"], c.student_temp, teacher_temp,
            teacher_probs=t_probs_ibot,
        )

        # BOTH global crops, summed (reference ssl_meta_arch.py:316-318:
        # sum over student_cls_tokens.chunk(2) — never between the two
        # crops of one image, hence per-crop calls)
        koleo = (loss_lib.koleo_loss(s_out_g["cls"][:b])
                 + loss_lib.koleo_loss(s_out_g["cls"][b:]))

        total = c.dino_weight * dino + c.ibot_weight * ibot + c.koleo_weight * koleo
        if c.centering == "sinkhorn_knopp":
            new_centers = centers
        else:
            new_centers = {
                "dino": loss_lib.update_center(centers["dino"], dino_center, c.center_momentum),
                "ibot": loss_lib.update_center(centers["ibot"], ibot_center, c.center_momentum),
            }
        metrics = {"dino": dino, "ibot": ibot, "koleo": koleo, "total": total}
        return total, (metrics, new_centers)

    @staticmethod
    def ema_update(teacher: Params, student: Params, momentum: jax.Array) -> Params:
        """teacher <- m * teacher + (1 - m) * student."""
        return jax.tree_util.tree_map(
            lambda t, s: momentum * t + (1.0 - momentum) * s, teacher, student
        )
