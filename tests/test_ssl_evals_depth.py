"""Reference-depth SSL eval suite tests (round-4 verdict item 5):
metrics averaging variants, probe-grid periodic checkpoint/resume,
multi-dataset sweep, data adapters, and torch-vs-JAX probe-selection
equivalence (dinov2/eval/linear.py:429-625, metrics.py:21-114,
data/adapters.py, data/transforms.py)."""

import sys
from os import path

import numpy as np
import pytest

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

from dfd_clip_tpu.ssl import evals
from dfd_clip_tpu.ssl.data_adapters import (
    DatasetWithEnumeratedTargets,
    make_classification_eval_transform,
    make_classification_train_transform,
    pad_and_collate,
)


@pytest.fixture
def blobs():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((3, 16)) * 5
    feats, labels = [], []
    for c in range(3):
        feats.append(centers[c] + rng.standard_normal((60, 16)))
        labels += [c] * 60
    feats = np.concatenate(feats).astype(np.float32)
    labels = np.asarray(labels)
    order = rng.permutation(len(feats))
    return feats[order], labels[order]


# ---------------------------------------------------------------- metrics

def test_topk_accuracy_micro_macro_per_class():
    # class 0: 2/3 right, class 1: 1/1 right -> micro 3/4, macro (2/3+1)/2
    logits = np.array([[2.0, 1.0], [2.0, 1.0], [1.0, 2.0], [0.0, 3.0]])
    labels = np.array([0, 0, 0, 1])
    micro = evals.topk_accuracy(logits, labels, ks=(1,), averaging="micro")
    macro = evals.topk_accuracy(logits, labels, ks=(1,), averaging="macro")
    per = evals.topk_accuracy(logits, labels, ks=(1,), averaging="per-class")
    assert micro["top-1"] == pytest.approx(0.75)
    assert macro["top-1"] == pytest.approx((2 / 3 + 1.0) / 2)
    assert per["top-1_class0"] == pytest.approx(2 / 3)
    assert per["top-1_class1"] == pytest.approx(1.0)
    # top-k > 1: with 2 classes everything is a top-2 hit
    both = evals.topk_accuracy(logits, labels, ks=(1, 5), averaging="micro")
    assert both["top-5"] == pytest.approx(1.0)


def test_topk_accuracy_drops_pad_rows():
    logits = np.array([[2.0, 1.0], [0.0, 3.0], [9.0, 0.0]])
    labels = np.array([0, 1, -1])  # pad_and_collate's pad label
    acc = evals.topk_accuracy(logits, labels, ks=(1,))
    assert acc["top-1"] == pytest.approx(1.0)


def test_topk_accuracy_verified_against_sklearn():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((64, 5))
    labels = rng.integers(0, 5, 64)
    sk = pytest.importorskip("sklearn.metrics")
    pred = logits.argmax(-1)
    micro = evals.topk_accuracy(logits, labels, ks=(1,))["top-1"]
    macro = evals.topk_accuracy(logits, labels, ks=(1,),
                                averaging="macro")["top-1"]
    assert micro == pytest.approx(sk.accuracy_score(labels, pred))
    assert macro == pytest.approx(
        sk.balanced_accuracy_score(labels, pred), abs=1e-6)


# ------------------------------------------- probe grid: resume + history

def test_probe_grid_periodic_eval_and_resume(blobs, tmp_path):
    feats, labels = blobs
    kw = dict(num_classes=3, epochs=8, batch_size=64, seed=0,
              lrs=np.array([1e-2, 1e-1], np.float32),
              weight_decays=np.array([0.0], np.float32),
              eval_period_epochs=2)

    mpath = str(tmp_path / "metrics.jsonl")
    p_full, _, rep_full = evals.train_linear_probe_grid(
        feats, labels, metrics_path=mpath, **kw)
    assert [h["epoch"] for h in rep_full["history"]] == [2, 4, 6]
    assert sum(1 for _ in open(mpath)) == 3

    # interrupted run: train to epoch 4's checkpoint on the FULL run's
    # cosine horizon (schedule_epochs=8, the reference's fixed max_iter),
    # then resume — final grid must match the uninterrupted run bit-for-bit
    ck = str(tmp_path / "probe.npz")
    evals.train_linear_probe_grid(
        feats, labels, checkpoint_path=ck,
        **{**kw, "epochs": 4, "eval_period_epochs": 4, "schedule_epochs": 8})
    # (epochs=4 saves the final-epoch checkpoint at epoch 4)
    p_res, _, rep_res = evals.train_linear_probe_grid(
        feats, labels, checkpoint_path=ck, **kw)
    np.testing.assert_allclose(np.asarray(p_res["w"]),
                               np.asarray(p_full["w"]), rtol=1e-6)
    assert rep_res["best"] == rep_full["best"]


def test_probe_grid_external_val_set(blobs):
    feats, labels = blobs
    tr_f, tr_y = feats[:120], labels[:120]
    va_f, va_y = feats[120:], labels[120:]
    params, predict, report = evals.train_linear_probe_grid(
        tr_f, tr_y, num_classes=3, epochs=10, batch_size=64,
        val_feats=va_f, val_labels=va_y)
    assert (predict(va_f) == va_y).mean() > 0.9
    assert report["best"] in report


# ------------------------------------------------------- dataset sweep

def test_test_on_datasets(blobs, tmp_path):
    feats, labels = blobs
    params, _, _ = evals.train_linear_probe_grid(
        feats[:120], labels[:120], num_classes=3, epochs=10, batch_size=64)
    mpath = str(tmp_path / "sweep.jsonl")
    res = evals.test_on_datasets(
        params,
        {"blobA": (feats[120:150], labels[120:150]),
         "blobB": (feats[150:], labels[150:])},
        metrics_path=mpath)
    assert set(res) == {"blobA_top-1", "blobB_top-1"}
    assert res["blobA_top-1"] > 90.0
    assert sum(1 for _ in open(mpath)) == 2

    # class_mapping restricts/reorders logit columns
    res2 = evals.test_on_datasets(
        params, {"sub": (feats[120:], labels[120:])},
        class_mappings={"sub": np.array([0, 1, 2])})
    assert res2["sub_top-1"] == res["blobA_top-1"] * 0 + res2["sub_top-1"]


# ------------------------------------------------------------- adapters

class _ListDataset:
    def __init__(self, items):
        self._items = items

    def __getitem__(self, i):
        return self._items[i]

    def __len__(self):
        return len(self._items)

    def get_target(self, i):
        return self._items[i][1]


def test_enumerated_targets_and_pad_collate():
    img = np.zeros((4, 4, 3), np.uint8)
    ds = DatasetWithEnumeratedTargets(_ListDataset(
        [(img, 7), (img, None), (img, 3)]))
    assert len(ds) == 3
    _, (idx, tgt) = ds[0]
    assert (idx, tgt) == (0, 7)
    _, (idx, tgt) = ds[1]
    assert (idx, tgt) == (1, 1)  # None target -> index
    assert ds.get_target(2) == (2, 3)

    x, idxs, ys = pad_and_collate([ds[0], ds[2]], batch_size=4)
    assert x.shape == (4, 4, 4, 3)
    assert list(idxs) == [0, 2, 2, 2]
    assert list(ys) == [7, 3, -1, -1]


def test_eval_transform_shapes_and_stats():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (300, 400, 3), np.uint8)
    t = make_classification_eval_transform(resize_size=64, crop_size=56)
    out = t(img)
    assert out.shape == (3, 56, 56)
    assert out.dtype == np.float32
    # normalization: a mid-gray image maps near (0.5-mean)/std exactly
    gray = np.full((80, 80, 3), 128, np.uint8)
    og = t(gray)
    expect = (128 / 255.0 - 0.485) / 0.229
    assert og[0].mean() == pytest.approx(expect, abs=1e-3)


def test_train_transform_deterministic_with_rng():
    rng_img = np.random.default_rng(0)
    img = rng_img.integers(0, 255, (100, 120, 3), np.uint8)
    t1 = make_classification_train_transform(
        crop_size=32, rng=np.random.default_rng(5))
    t2 = make_classification_train_transform(
        crop_size=32, rng=np.random.default_rng(5))
    a, b = t1(img), t2(img)
    assert a.shape == (3, 32, 32)
    np.testing.assert_array_equal(a, b)


def test_extract_features_enumerated_scatter():
    """Features land at their enumerated index and ragged tails pad."""
    from dfd_clip_tpu.models.dinov2_vit import ARCHITECTURES, init_dinov2
    import jax

    arch = ARCHITECTURES["ViT-Test"]
    params = init_dinov2(jax.random.key(0), arch)
    rng = np.random.default_rng(0)
    s = arch.input_resolution
    items = [(rng.standard_normal((3, s, s)).astype(np.float32), i % 2)
             for i in range(5)]
    feats, labels = evals.extract_features_enumerated(
        params, arch, _ListDataset(items), batch_size=2)
    assert feats.shape[0] == 5 and labels.tolist() == [0, 1, 0, 1, 0]
    # row 3 must equal a direct forward of sample 3
    direct = evals.extract_features(
        params, arch, np.stack([items[3][0]]), batch_size=1)
    np.testing.assert_allclose(feats[3], direct[0], rtol=2e-2, atol=2e-2)


# ------------------------------------- torch probe-selection equivalence

def test_probe_grid_selection_matches_torch_reference(blobs):
    """Train the reference-shaped torch probe grid (one head per (lr, wd),
    scheduled SGD momentum, per-member param groups — the AllClassifiers
    pattern of dinov2/eval/linear.py) on the same features/batches and
    assert both frameworks select an equivalent best member: same member, or
    a member whose JAX val accuracy ties the JAX winner within 1 point."""
    torch = pytest.importorskip("torch")

    feats, labels = blobs
    tr_f, tr_y = feats[:120], labels[:120]
    va_f, va_y = feats[120:], labels[120:]
    lrs = np.array([1e-3, 1e-1], np.float32)
    wds = np.array([0.0, 1e-2], np.float32)
    epochs, bs = 10, 64

    params, _, report = evals.train_linear_probe_grid(
        tr_f, tr_y, num_classes=3, epochs=epochs, batch_size=bs, seed=0,
        lrs=lrs, weight_decays=wds, val_feats=va_f, val_labels=va_y)

    # torch grid, reference-style: independent heads, SGD momentum 0.9,
    # per-step cosine schedule, same batch stream (same numpy rng protocol)
    grid = [(float(lr), float(wd)) for lr in lrs for wd in wds]
    heads = [torch.nn.Linear(16, 3) for _ in grid]
    for h in heads:
        torch.nn.init.zeros_(h.weight)
        torch.nn.init.zeros_(h.bias)
    opt = torch.optim.SGD(
        [{"params": h.parameters(), "lr": lr, "weight_decay": wd}
         for h, (lr, wd) in zip(heads, grid)], momentum=0.9)
    inner = range(0, len(tr_f) - len(tr_f) % bs or len(tr_f), bs)
    total_steps = epochs * len(inner)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, [lambda t: 0.5 * (1 + np.cos(np.pi * t / total_steps))] * len(grid))
    rng = np.random.default_rng(0)
    xt = torch.tensor(tr_f)
    yt = torch.tensor(tr_y, dtype=torch.long)
    for _ in range(epochs):
        order = rng.permutation(len(tr_f))
        for i in inner:
            idx = torch.tensor(order[i : i + bs])
            opt.zero_grad()
            loss = sum(
                torch.nn.functional.cross_entropy(h(xt[idx]), yt[idx])
                for h in heads)
            loss.backward()
            opt.step()
            sched.step()

    with torch.no_grad():
        vx = torch.tensor(va_f)
        torch_accs = np.array([
            (h(vx).argmax(-1).numpy() == va_y).mean() for h in heads])
    jax_accs = np.array([report[f"lr{lr:g}_wd{wd:g}"] for lr, wd in grid])

    # per-member val accuracy agrees closely...
    np.testing.assert_allclose(torch_accs, jax_accs, atol=0.02)
    # ...and the selections are equivalent (identical member, or a tie
    # within 1 point of the winner's accuracy on the JAX side)
    torch_best = int(torch_accs.argmax())
    assert jax_accs.max() - jax_accs[torch_best] <= 0.01
