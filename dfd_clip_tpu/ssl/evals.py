"""SSL evaluation suite: feature extraction, kNN, linear probe, logistic
regression.

TPU-native equivalents of dinov2/eval/{knn.py, linear.py, log_regression.py}
(the last replacing cuML, SURVEY.md §2.9 #6): features are extracted with a
jitted backbone forward over the mesh, kNN is a cosine-similarity vote,
the linear probe is an optax SGD loop over frozen features, and logistic
regression is L-BFGS-free Adam with L2.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import dinov2_vit
from ..models.clip_vit import ViTConfig


def extract_features(
    backbone_params,
    arch: ViTConfig,
    images: np.ndarray,  # (N, 3, S, S) float32 normalized
    batch_size: int = 64,
    compute_dtype=jnp.bfloat16,
) -> np.ndarray:
    """CLS features (N, W) (equivalent of dinov2/eval/utils.py:100-147)."""
    fwd = jax.jit(
        lambda p, x: dinov2_vit.dinov2_forward(p, x, arch, compute_dtype)["cls"]
    )
    feats = []
    n = len(images)
    if n == 0:
        raise ValueError(
            "extract_features got an empty image set (empty eval split?)"
        )
    for i in range(0, n, batch_size):
        x = images[i : i + batch_size]
        valid = x.shape[0]
        if valid < batch_size and n > batch_size:
            x = np.concatenate([x, np.repeat(x[-1:], batch_size - valid, 0)])
        feats.append(np.asarray(fwd(backbone_params, x))[:valid])
    return np.concatenate(feats)


def knn_classify(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    test_feats: np.ndarray,
    k: int = 20,
    temperature: float = 0.07,
    num_classes: Optional[int] = None,
) -> np.ndarray:
    """Weighted cosine-kNN vote (dinov2/eval/knn.py semantics)."""
    num_classes = num_classes or int(train_labels.max()) + 1
    k = min(k, len(train_feats))  # tiny gallery: vote over what exists

    def normalize(f):
        return f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

    tr = jnp.asarray(normalize(train_feats))
    te = jnp.asarray(normalize(test_feats))
    labels = jnp.asarray(train_labels)

    @jax.jit
    def vote(q):
        sim = q @ tr.T  # (B, N)
        topv, topi = jax.lax.top_k(sim, k)
        w = jnp.exp(topv / temperature)
        onehot = jax.nn.one_hot(labels[topi], num_classes)  # (B, k, C)
        scores = jnp.sum(w[..., None] * onehot, axis=1)
        return jnp.argmax(scores, axis=-1)

    return np.asarray(vote(te))


def train_linear_probe(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    num_classes: int,
    lr: float = 0.01,
    epochs: int = 50,
    batch_size: int = 256,
    weight_decay: float = 0.0,
    seed: int = 0,
) -> Tuple[Dict, Callable]:
    """SGD linear classifier on frozen features (dinov2/eval/linear.py's
    probe, single configuration). Returns (params, predict_fn)."""
    d = train_feats.shape[1]
    key = jax.random.key(seed)
    params = {
        "w": jnp.zeros((d, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    total_steps = max(1, epochs * ((len(train_feats) + batch_size - 1) // batch_size))
    opt = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(optax.cosine_decay_schedule(lr, total_steps), momentum=0.9),
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, y)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    n = len(train_feats)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n - n % batch_size or n, batch_size):
            idx = order[i : i + batch_size]
            params, opt_state, _ = step(
                params, opt_state,
                jnp.asarray(train_feats[idx]), jnp.asarray(train_labels[idx]),
            )

    def predict(feats: np.ndarray) -> np.ndarray:
        logits = jnp.asarray(feats) @ params["w"] + params["b"]
        return np.asarray(jnp.argmax(logits, axis=-1))

    return params, predict


def train_logistic_regression(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    num_classes: int,
    l2: float = 1e-4,
    steps: int = 500,
    lr: float = 0.1,
) -> Callable:
    """Full-batch Adam logistic regression (replaces cuML's GPU logreg,
    dinov2/eval/log_regression.py)."""
    x = jnp.asarray(train_feats)
    y = jnp.asarray(train_labels)
    d = x.shape[1]
    params = {
        "w": jnp.zeros((d, num_classes), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            ce = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, y))
            return ce + l2 * jnp.sum(jnp.square(p["w"]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(steps):
        params, opt_state, _ = step(params, opt_state)

    def predict(feats: np.ndarray) -> np.ndarray:
        logits = jnp.asarray(feats) @ params["w"] + params["b"]
        return np.asarray(jnp.argmax(logits, axis=-1))

    return predict


def train_linear_probe_grid(
    train_feats: np.ndarray,
    train_labels: np.ndarray,
    num_classes: int,
    lrs: Optional[np.ndarray] = None,
    weight_decays: Optional[np.ndarray] = None,
    val_fraction: float = 0.1,
    epochs: int = 50,
    batch_size: int = 256,
    seed: int = 0,
) -> Tuple[Dict, Callable, Dict]:
    """Jointly train a GRID of linear classifiers over (lr, weight_decay).

    The TPU-idiomatic analog of dinov2/eval/linear.py's ``AllClassifiers``
    (a dict of heads trained in one DDP module, :429): every (lr, wd) member
    is an independent (w, b) trained in ONE jitted vmapped SGD step, so the
    whole grid costs one pass over the features. The best member by held-out
    accuracy is returned as (params, predict_fn, report).
    """
    if lrs is None:
        lrs = np.array([1e-3, 3e-3, 1e-2, 3e-2, 1e-1], np.float32)
    if weight_decays is None:
        weight_decays = np.array([0.0, 1e-4], np.float32)
    grid = [(float(lr), float(wd)) for lr in lrs for wd in weight_decays]
    g = len(grid)
    lr_arr = jnp.asarray([p[0] for p in grid])
    wd_arr = jnp.asarray([p[1] for p in grid])

    rng = np.random.default_rng(seed)
    n = len(train_feats)
    order = rng.permutation(n)
    n_val = max(1, int(n * val_fraction))
    val_idx, tr_idx = order[:n_val], order[n_val:]
    xs, ys = train_feats[tr_idx], train_labels[tr_idx]
    d = train_feats.shape[1]

    params = {
        "w": jnp.zeros((g, d, num_classes), jnp.float32),
        "b": jnp.zeros((g, num_classes), jnp.float32),
    }
    mom = jax.tree_util.tree_map(jnp.zeros_like, params)
    steps_per_epoch = max(1, (len(xs) + batch_size - 1) // batch_size)
    total_steps = epochs * steps_per_epoch

    @jax.jit
    def step(params, mom, x, y, t):
        # cosine decay shared across members; base lr per member
        scale = 0.5 * (1.0 + jnp.cos(jnp.pi * t / total_steps))

        def member_grads(w, b, wd):
            def loss_fn(wb):
                logits = x @ wb[0] + wb[1]
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, y)
                )

            gw, gb = jax.grad(loss_fn)((w, b))
            return gw + wd * w, gb

        gw, gb = jax.vmap(member_grads)(params["w"], params["b"], wd_arr)
        new_mom = {"w": 0.9 * mom["w"] + gw, "b": 0.9 * mom["b"] + gb}
        lr_t = lr_arr * scale
        params = {
            "w": params["w"] - lr_t[:, None, None] * new_mom["w"],
            "b": params["b"] - lr_t[:, None] * new_mom["b"],
        }
        return params, new_mom

    t = 0
    for _ in range(epochs):
        ep_order = rng.permutation(len(xs))
        for i in range(0, len(xs) - len(xs) % batch_size or len(xs), batch_size):
            idx = ep_order[i : i + batch_size]
            params, mom = step(params, mom, jnp.asarray(xs[idx]),
                               jnp.asarray(ys[idx]), jnp.asarray(t, jnp.float32))
            t += 1

    # held-out selection across the whole grid in one matmul
    val_logits = jnp.einsum("nd,gdc->gnc", jnp.asarray(train_feats[val_idx]),
                            params["w"]) + params["b"][:, None, :]
    val_acc = jnp.mean(
        (jnp.argmax(val_logits, -1) == jnp.asarray(train_labels[val_idx])[None]),
        axis=-1,
    )
    best = int(jnp.argmax(val_acc))
    best_params = {"w": params["w"][best], "b": params["b"][best]}
    report = {
        f"lr{lr:g}_wd{wd:g}": float(val_acc[i]) for i, (lr, wd) in enumerate(grid)
    }
    report["best"] = f"lr{grid[best][0]:g}_wd{grid[best][1]:g}"

    def predict(feats: np.ndarray) -> np.ndarray:
        logits = jnp.asarray(feats) @ best_params["w"] + best_params["b"]
        return np.asarray(jnp.argmax(logits, axis=-1))

    return best_params, predict, report
