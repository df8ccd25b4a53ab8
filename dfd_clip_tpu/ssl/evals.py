"""SSL evaluation suite: feature extraction, kNN, linear probe, logistic
regression.

TPU-native equivalents of dinov2/eval/{knn.py, linear.py, log_regression.py}
(the last replacing cuML, SURVEY.md §2.9 #6): features are extracted with a
jitted backbone forward over the mesh, kNN is a cosine-similarity vote,
the linear probe is an optax SGD loop over frozen features, and logistic
regression is L-BFGS-free Adam with L2.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import dinov2_vit
from ..models.clip_vit import ViTConfig


def topk_accuracy(
    logits: np.ndarray,
    labels: np.ndarray,
    ks: Sequence[int] = (1, 5),
    averaging: str = "micro",
    num_classes: Optional[int] = None,
) -> Dict[str, float]:
    """Top-k accuracy with the reference's averaging modes
    (dinov2/eval/metrics.py:21-114 build_topk_accuracy_metric):

      micro      — MEAN_ACCURACY (torchmetrics average="micro")
      macro      — MEAN_PER_CLASS_ACCURACY (average="macro": accuracy per
                   class, then unweighted mean over classes seen in labels)
      per-class  — PER_CLASS_ACCURACY (average=None: one entry per class)

    Padded eval rows carry label < 0 (pad_and_collate) and are dropped, the
    way the reference's _pad_and_collate pads with -1."""
    labels = np.asarray(labels)
    valid = labels >= 0
    logits, labels = np.asarray(logits)[valid], labels[valid]
    if num_classes is None:
        num_classes = logits.shape[-1]
    out: Dict[str, float] = {}
    # one argsort serves every k
    kmax = min(max(ks), logits.shape[-1])
    top = np.argsort(-logits, axis=-1)[:, :kmax]
    for k in ks:
        k_eff = min(k, logits.shape[-1])
        hit = (top[:, :k_eff] == labels[:, None]).any(axis=-1)
        if averaging == "micro":
            out[f"top-{k}"] = float(hit.mean()) if len(hit) else 0.0
            continue
        per_class = np.full((num_classes,), np.nan)
        for c in np.unique(labels):
            per_class[c] = float(hit[labels == c].mean())
        if averaging == "macro":
            seen = ~np.isnan(per_class)
            out[f"top-{k}"] = float(per_class[seen].mean()) if seen.any() else 0.0
        elif averaging == "per-class":
            for c in range(num_classes):
                if not np.isnan(per_class[c]):
                    out[f"top-{k}_class{c}"] = per_class[c]
        else:
            raise ValueError(f"unknown averaging {averaging!r}")
    return out


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


def extract_features_enumerated(
    backbone_params,
    arch: ViTConfig,
    dataset,
    transform: Optional[Callable] = None,
    batch_size: int = 64,
    compute_dtype=jnp.bfloat16,
) -> Tuple[np.ndarray, np.ndarray]:
    """Feature extraction over an (image, target) dataset through the
    enumerated-targets adapter: samples are transformed host-side, batches
    padded to a static shape (pad label -1), and each feature row scattered
    into the global (N, W) array by its enumerated index — shard-order
    independent, like the reference's distributed gather
    (dinov2/eval/utils.py:100-147 over data/adapters.py). Returns
    (features, labels)."""
    from .data_adapters import DatasetWithEnumeratedTargets, pad_and_collate

    ds = DatasetWithEnumeratedTargets(dataset)
    n = len(ds)
    if n == 0:
        raise ValueError("extract_features_enumerated got an empty dataset")
    fwd = jax.jit(
        lambda p, x: dinov2_vit.dinov2_forward(p, x, arch, compute_dtype)["cls"]
    )
    feats = labels = None
    for i in range(0, n, batch_size):
        batch = [ds[j] for j in range(i, min(i + batch_size, n))]
        if transform is not None:
            batch = [(transform(img), t) for img, t in batch]
        x, idxs, ys = pad_and_collate(
            batch, batch_size if n > batch_size else None)
        out = np.asarray(fwd(backbone_params, x.astype(np.float32)))
        if feats is None:
            feats = np.zeros((n, out.shape[-1]), out.dtype)
            labels = np.full((n,), -1, np.int64)
        valid = ys >= 0
        feats[idxs[valid]] = out[valid]
        labels[idxs[valid]] = ys[valid]
    return feats, labels


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
    val_feats: Optional[np.ndarray] = None,
    val_labels: Optional[np.ndarray] = None,
    eval_period_epochs: int = 0,
    checkpoint_path: Optional[str] = None,
    metrics_path: Optional[str] = None,
    schedule_epochs: Optional[int] = None,
) -> Tuple[Dict, Callable, Dict]:
    """Jointly train a GRID of linear classifiers over (lr, weight_decay).

    The TPU-idiomatic analog of dinov2/eval/linear.py's ``AllClassifiers``
    (a dict of heads trained in one DDP module, :429): every (lr, wd) member
    is an independent (w, b) trained in ONE jitted vmapped SGD step, so the
    whole grid costs one pass over the features. The best member by held-out
    accuracy is returned as (params, predict_fn, report).

    Reference-depth knobs (dinov2/eval/linear.py:380-460):
      val_feats/val_labels — a dedicated validation set for selection
        (default: an internal val_fraction split of the train features);
      eval_period_epochs   — evaluate the whole grid every N epochs and log
        one JSONL line per eval to ``metrics_path`` (the reference's
        results_eval_linear.json stream), recorded in report["history"];
      checkpoint_path      — periodic .npz checkpoint of the grid + momenta
        at every eval; an existing file RESUMES training at its epoch (the
        reference's PeriodicCheckpointer(resume=True)). The permutation
        stream is replayed deterministically, so a resumed run converges to
        the same selection as an uninterrupted one;
      schedule_epochs      — the cosine schedule's fixed horizon (defaults
        to ``epochs``): an early-stopped run (epochs < schedule_epochs)
        checkpoints states that a later resume continues bit-for-bit, like
        the reference's fixed max_iter.
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
    if val_feats is not None:
        xs, ys = train_feats, train_labels
        vx, vy = val_feats, val_labels
    else:
        order = rng.permutation(n)
        n_val = max(1, int(n * val_fraction))
        val_idx, tr_idx = order[:n_val], order[n_val:]
        xs, ys = train_feats[tr_idx], train_labels[tr_idx]
        vx, vy = train_feats[val_idx], train_labels[val_idx]
    d = train_feats.shape[1]

    params = {
        "w": jnp.zeros((g, d, num_classes), jnp.float32),
        "b": jnp.zeros((g, num_classes), jnp.float32),
    }
    mom = jax.tree_util.tree_map(jnp.zeros_like, params)
    steps_per_epoch = max(1, (len(xs) + batch_size - 1) // batch_size)
    horizon = epochs if schedule_epochs is None else schedule_epochs
    if horizon < epochs:
        raise ValueError(
            f"schedule_epochs={horizon} must cover epochs={epochs}")
    total_steps = horizon * steps_per_epoch

    start_epoch = 0
    if checkpoint_path and os.path.isfile(checkpoint_path):
        ck = np.load(checkpoint_path)
        params = {"w": jnp.asarray(ck["w"]), "b": jnp.asarray(ck["b"])}
        mom = {"w": jnp.asarray(ck["mw"]), "b": jnp.asarray(ck["mb"])}
        start_epoch = int(ck["epoch"])
        # replay the permutation stream for the completed epochs so the
        # resumed run sees the exact batches the uninterrupted one would
        for _ in range(start_epoch):
            rng.permutation(len(xs))

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

    def grid_val_acc(params):
        # held-out selection across the whole grid in one matmul
        logits = jnp.einsum("nd,gdc->gnc", jnp.asarray(vx),
                            params["w"]) + params["b"][:, None, :]
        return jnp.mean(
            (jnp.argmax(logits, -1) == jnp.asarray(vy)[None]), axis=-1)

    def save_ck(epoch):
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(tmp, w=np.asarray(params["w"]), b=np.asarray(params["b"]),
                 mw=np.asarray(mom["w"]), mb=np.asarray(mom["b"]),
                 epoch=epoch)
        os.replace(tmp, checkpoint_path)

    history = []
    inner = range(0, len(xs) - len(xs) % batch_size or len(xs), batch_size)
    t = start_epoch * len(inner)
    for ep in range(start_epoch, epochs):
        ep_order = rng.permutation(len(xs))
        for i in inner:
            idx = ep_order[i : i + batch_size]
            params, mom = step(params, mom, jnp.asarray(xs[idx]),
                               jnp.asarray(ys[idx]), jnp.asarray(t, jnp.float32))
            t += 1
        if (eval_period_epochs and (ep + 1) % eval_period_epochs == 0
                and ep + 1 < epochs):
            acc = grid_val_acc(params)
            b = int(jnp.argmax(acc))
            rec = {"epoch": ep + 1,
                   "best": f"lr{grid[b][0]:g}_wd{grid[b][1]:g}",
                   "best_acc": float(acc[b]),
                   "members": {f"lr{lr:g}_wd{wd:g}": float(acc[i])
                               for i, (lr, wd) in enumerate(grid)}}
            history.append(rec)
            if metrics_path:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            if checkpoint_path:
                save_ck(ep + 1)

    val_acc = grid_val_acc(params)
    best = int(jnp.argmax(val_acc))
    best_params = {"w": params["w"][best], "b": params["b"][best]}
    report = {
        f"lr{lr:g}_wd{wd:g}": float(val_acc[i]) for i, (lr, wd) in enumerate(grid)
    }
    report["best"] = f"lr{grid[best][0]:g}_wd{grid[best][1]:g}"
    if eval_period_epochs:
        report["history"] = history
    if checkpoint_path:
        save_ck(epochs)

    def predict(feats: np.ndarray) -> np.ndarray:
        logits = jnp.asarray(feats) @ best_params["w"] + best_params["b"]
        return np.asarray(jnp.argmax(logits, axis=-1))

    return best_params, predict, report


def test_on_datasets(
    probe_params: Dict,
    datasets: Mapping[str, Tuple[np.ndarray, np.ndarray]],
    ks: Sequence[int] = (1,),
    averaging: str = "micro",
    class_mappings: Optional[Mapping[str, np.ndarray]] = None,
    metrics_path: Optional[str] = None,
) -> Dict[str, float]:
    """Evaluate the selected probe on several test feature sets — the
    reference's multi-dataset sweep (dinov2/eval/linear.py:429-462
    test_on_datasets), feature-space form: each entry maps a dataset name to
    (features, labels); padded rows carry label -1 (pad_and_collate) and are
    ignored. ``class_mappings[name]`` optionally restricts/reorders the
    logit columns the way the reference's class_mapping does (e.g. an
    ImageNet subset). Returns {f"{name}_top-k": percent} and appends one
    JSONL record per dataset to ``metrics_path`` when given."""
    results: Dict[str, float] = {}
    for name, (feats, labels) in datasets.items():
        logits = np.asarray(
            jnp.asarray(feats) @ probe_params["w"] + probe_params["b"])
        if class_mappings and name in class_mappings:
            logits = logits[:, np.asarray(class_mappings[name])]
        accs = topk_accuracy(logits, labels, ks=ks, averaging=averaging)
        for k, v in accs.items():
            results[f"{name}_{k}"] = 100.0 * v
        if metrics_path:
            with open(metrics_path, "a") as f:
                f.write(json.dumps({"dataset": name, **accs}) + "\n")
    return results
