"""SSL objectives: DINO CLS loss, iBOT masked-patch loss, KoLeo regularizer.

Behavioral equivalents of dinov2/loss/ (dino_clstoken_loss.py:12-113,
ibot_patch_loss.py:17-151, koleo_loss.py:19-49). Cross-replica reductions
(the reference's async all-reduce center updates) are jnp.mean/psum inside
the jitted step — XLA inserts the collectives over the mesh's data axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def dino_loss(
    student_logits: jax.Array,   # (n_s_crops, B, K)
    teacher_logits: jax.Array,   # (n_t_crops, B, K)
    center: jax.Array,           # (K,)
    student_temp: float,
    teacher_temp: jax.Array,
    teacher_probs: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Soft cross-entropy between teacher (centered, sharpened) and student
    distributions over every (teacher crop, student crop) pair with
    teacher_crop != student_crop. Returns (loss, new_center_stats).

    ``teacher_probs`` overrides the softmax-centering distribution — the
    sinkhorn_knopp centering mode passes the SK assignment here
    (dinov2/train/ssl_meta_arch.py:215-219)."""
    if teacher_probs is not None:
        t_probs = teacher_probs
    else:
        t_probs = jax.nn.softmax(
            (teacher_logits - center) / teacher_temp, axis=-1
        )  # (n_t, B, K)
    s_logp = jax.nn.log_softmax(student_logits / student_temp, axis=-1)  # (n_s, B, K)

    n_t, n_s = t_probs.shape[0], s_logp.shape[0]
    total = 0.0
    n_terms = 0
    for it in range(n_t):
        for is_ in range(n_s):
            if it == is_:
                continue  # same-view pairs are skipped (DINO recipe)
            total = total - jnp.mean(
                jnp.sum(t_probs[it] * s_logp[is_], axis=-1)
            )
            n_terms += 1
    loss = total / max(n_terms, 1)

    # EMA center statistics: batch mean of raw teacher logits (the caller
    # applies the EMA update; under pjit the mean reduces over all replicas).
    batch_center = jnp.mean(teacher_logits, axis=(0, 1))
    return loss, batch_center


def update_center(center: jax.Array, batch_center: jax.Array,
                  momentum: float = 0.9) -> jax.Array:
    return center * momentum + batch_center * (1.0 - momentum)


def sinkhorn_knopp(teacher_logits: jax.Array, teacher_temp: jax.Array,
                   n_iterations: int = 3) -> jax.Array:
    """Sinkhorn-Knopp assignment alternative to centering
    (dino_clstoken_loss.py:36-61). Cross-replica correctness is structural:
    under pjit the batch axis is globally sharded, so the jnp.sum reductions
    ARE the reference's all_reduce calls (XLA inserts the collectives). The
    global max subtraction stabilizes exp without changing the result (it is
    a constant factor removed by the sum_Q normalization)."""
    z = (teacher_logits / teacher_temp).astype(jnp.float32)
    Q = jnp.exp(z - jnp.max(z)).T  # (K, B*)
    Q = Q / jnp.sum(Q)
    K, B = Q.shape

    def body(_, Q):
        Q = Q / jnp.sum(Q, axis=1, keepdims=True) / K
        Q = Q / jnp.sum(Q, axis=0, keepdims=True) / B
        return Q

    Q = jax.lax.fori_loop(0, n_iterations, body, Q)
    return (Q * B).T


def sinkhorn_knopp_masked(
    teacher_patch_logits: jax.Array,  # (N, P, K)
    patch_mask: jax.Array,            # (N, P) bool, True = masked patch
    teacher_temp: jax.Array,
    n_iterations: int = 3,
) -> jax.Array:
    """iBOT-side Sinkhorn (ibot_patch_loss.py:63-91): assignments over the
    *masked* patches only, B = global masked-patch count. The reference packs
    masked patches into a dense buffer; with XLA static shapes we keep the
    full (N*P) column axis and zero out unmasked columns — those columns are
    never read by the loss (it filters by the same mask)."""
    n, p, k = teacher_patch_logits.shape
    z = (teacher_patch_logits.reshape(n * p, k) / teacher_temp).astype(jnp.float32)
    m = patch_mask.reshape(n * p).astype(jnp.float32)
    Q = jnp.exp(z - jnp.max(z)).T * m[None, :]  # (K, N*P), unmasked cols = 0
    B = jnp.maximum(jnp.sum(m), 1.0)
    # guard the no-masked-patches batch (mask_sample_prob can produce one):
    # sum(Q)=0 would give 0/0=NaN teacher probs whose NaN leaks into the
    # student grads through the where() backward
    Q = Q / jnp.maximum(jnp.sum(Q), 1e-30)

    def body(_, Q):
        rows = jnp.sum(Q, axis=1, keepdims=True)
        Q = Q / jnp.where(rows > 0, rows, 1.0) / k
        cols = jnp.sum(Q, axis=0, keepdims=True)
        Q = Q / jnp.where(cols > 0, cols, 1.0) / B
        return Q

    Q = jax.lax.fori_loop(0, n_iterations, body, Q)
    return (Q * B).T.reshape(n, p, k)


def ibot_patch_loss(
    student_patch_logits: jax.Array,  # (B, P, K) — student on masked image
    teacher_patch_logits: jax.Array,  # (B, P, K) — teacher on clean image
    patch_mask: jax.Array,            # (B, P) bool, True = masked patch
    center: jax.Array,                # (K,)
    student_temp: float,
    teacher_temp: jax.Array,
    teacher_probs: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """CE between teacher and student patch distributions on masked patches
    only, with the reference's per-image weighting (forward_masked,
    ibot_patch_loss.py:107-127): each image's masked patches are weighted by
    1/its own masked count and the sum is divided by the image count, so an
    image masking many patches does not dominate one masking few (mask
    ratios are sampled per-image in [ratio_min, ratio_max]).
    ``teacher_probs`` overrides softmax-centering (sinkhorn_knopp mode)."""
    if teacher_probs is not None:
        t_probs = teacher_probs
    else:
        t_probs = jax.nn.softmax(
            (teacher_patch_logits - center) / teacher_temp, axis=-1
        )
    s_logp = jax.nn.log_softmax(student_patch_logits / student_temp, axis=-1)
    per_patch = -jnp.sum(t_probs * s_logp, axis=-1)  # (B, P)
    per_image_count = jnp.maximum(jnp.sum(patch_mask, axis=-1, keepdims=True), 1.0)
    masked = jnp.where(patch_mask, per_patch / per_image_count, 0.0)
    loss = jnp.sum(masked) / patch_mask.shape[0]
    count = jnp.maximum(jnp.sum(patch_mask), 1)

    batch_center = jnp.sum(
        jnp.where(patch_mask[..., None], teacher_patch_logits, 0.0), axis=(0, 1)
    ) / count
    return loss, batch_center


def koleo_loss(features: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Kozachenko-Leonenko differential-entropy regularizer: -mean log of the
    nearest-neighbor distance of L2-normalized CLS features
    (koleo_loss.py:19-49)."""
    f = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + eps)
    sim = f @ f.T  # (B, B)
    n = f.shape[0]
    sim = sim - 2.0 * jnp.eye(n)  # exclude self
    nn_idx = jnp.argmax(sim, axis=-1)
    nn = f[nn_idx]
    dist = jnp.linalg.norm(f - nn, axis=-1)
    return -jnp.mean(jnp.log(dist + eps))
