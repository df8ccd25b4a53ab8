"""tools/analysis.py — the reference's analysis-notebook workflows as CLIs.

Covers the kv-distribution / augment-impact / comb-impact pipelines
(reference repo root *.ipynb) on the ViT-Test tower over fixture videos,
including the guide-map output contract consumed by the Detector's
patch_mask type "guide" (models/detector.py:416-440).
"""

import pickle
import sys
from os import path

import numpy as np
import pytest

sys.path.insert(0, path.join(path.dirname(path.dirname(__file__)), "tools"))

import analysis  # noqa: E402
from fixtures import make_ffpp_tree  # noqa: E402

GRID = 2   # ViT-Test: 32px / patch 16
LAYERS = 3
WIDTH = 64


@pytest.fixture(scope="module")
def ffpp_root(tmp_path_factory):
    return make_ffpp_tree(str(tmp_path_factory.mktemp("ffpp")))


def _common(ffpp_root):
    return ["--root", ffpp_root, "--arch", "ViT-Test",
            "--types", "REAL", "DF", "--num-frames", "4",
            "--clip-duration", "2"]


def test_kv_dist(ffpp_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    analysis.main(["kv-dist", *_common(ffpp_root),
                   "--index", "0", "--patch-loc", "0,1",
                   "--out-dir", str(tmp_path / "out")])
    with open(tmp_path / "out" / "kv_distribution.pickle", "rb") as f:
        result = pickle.load(f)
    assert "c23" in result
    var = result["c23"]["variance"]
    sim = result["c23"]["similarity"]
    for s in ("q", "k", "v", "out"):
        assert len(var[s]) == LAYERS
        assert var[s][0].shape == (GRID, GRID)
        assert len(sim[s]) == LAYERS
        # similarity ribbons: (grid, frames*grid), rows softmaxed per frame
        assert sim[s][0].shape == (GRID, 4 * GRID)
        per_frame = sim[s][0].reshape(GRID, 4, GRID).transpose(1, 0, 2)
        np.testing.assert_allclose(
            per_frame.reshape(4, -1).sum(-1), 1.0, rtol=1e-4)


def test_kv_dist_by_video_name(ffpp_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    analysis.main(["kv-dist", *_common(ffpp_root),
                   "--video", "000_001", "--patch-loc", "0,0",
                   "--subjects", "k",
                   "--out-dir", str(tmp_path / "out")])
    with open(tmp_path / "out" / "kv_distribution.pickle", "rb") as f:
        result = pickle.load(f)
    assert set(result["c23"]["variance"].keys()) == {"k"}


def test_semantic_patches(ffpp_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "semantic_patches.pickle")
    analysis.main(["semantic-patches", *_common(ffpp_root),
                   "--num-samples", "3", "--out", out])
    with open(out, "rb") as f:
        result = pickle.load(f)
    assert set(result.keys()) == set(analysis.SUBJECTS)
    for region in analysis.SEMANTIC_LOCATIONS:
        embs = result["q"][region]
        assert len(embs) == LAYERS and embs[0].shape == (WIDTH,)
        assert np.isfinite(embs[0]).all()


def test_augment_impact_and_comb(ffpp_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    analysis.main(["augment-impact", *_common(ffpp_root),
                   "--settings", "dev-mode+force-rgb", "compression", "any",
                   "--num-samples", "2", "--out-dir", str(tmp_path)])
    maps = {}
    for setting in ("dev-mode+force-rgb", "compression", "any"):
        with open(tmp_path / f"{setting}.pickle", "rb") as f:
            maps[setting] = pickle.load(f)
        for s in ("k", "v"):
            assert len(maps[setting][s]) == LAYERS
            assert maps[setting][s][0].shape == (GRID, GRID)
            assert np.isfinite(maps[setting][s][0]).all()

    # identical inputs (same clip, no augmentation) give ~zero divergence;
    # distinct clips ("any") must diverge more than a replayed pair
    guide = str(tmp_path / "guide_map.pickle")
    analysis.main([
        "comb-impact",
        "--inputs", str(tmp_path / "compression.pickle"),
        str(tmp_path / "dev-mode+force-rgb.pickle"),
        str(tmp_path / "any.pickle"),
        "--weights", "0.5", "0.5", "0",
        "--invert-last", "--out", guide])
    with open(guide, "rb") as f:
        gm = pickle.load(f)
    for s in ("k", "v"):
        assert len(gm[s]) == LAYERS
        for m in gm[s]:
            assert m.shape == (GRID, GRID)
            np.testing.assert_allclose(m.sum(), 1.0, rtol=1e-5)
            assert (m >= 0).all()


def test_comb_impact_complement_form(tmp_path):
    # the reference's (2 - sum)/2 combination (comb cell 3) stays a
    # normalized distribution
    rng = np.random.default_rng(0)
    pks = []
    for i in range(2):
        d = {s: [rng.random((GRID, GRID)).astype(np.float32)
                 for _ in range(LAYERS)] for s in ("k", "v")}
        p = str(tmp_path / f"in{i}.pickle")
        with open(p, "wb") as f:
            pickle.dump(d, f)
        pks.append(p)
    out = str(tmp_path / "guide.pickle")
    analysis.main(["comb-impact", "--inputs", *pks,
                   "--weights", "0.5", "1.0", "--invert-last",
                   "--complement", "--out", out])
    with open(out, "rb") as f:
        gm = pickle.load(f)
    for s in ("k", "v"):
        for m in gm[s]:
            np.testing.assert_allclose(m.sum(), 1.0, rtol=1e-5)


def test_guide_map_feeds_detector_patch_mask(ffpp_root, tmp_path, monkeypatch):
    """The comb-impact output is a valid prior for patch_mask type 'guide'."""
    monkeypatch.chdir(tmp_path)
    analysis.main(["augment-impact", *_common(ffpp_root),
                   "--settings", "any", "--num-samples", "1",
                   "--out-dir", str(tmp_path)])
    guide = str(tmp_path / "guide_map.pickle")
    analysis.main(["comb-impact", "--inputs", str(tmp_path / "any.pickle"),
                   "--weights", "1.0", "--out", guide])

    from fixtures import tiny_detector

    model = tiny_detector(train_mode={
        "patch_mask": {"type": "guide", "ratio": 0.5, "path": guide}
    })
    assert model.guide_map is not None
    idx = model.sample_patch_indices(np.random.default_rng(0))
    n_patches = GRID * GRID
    assert (idx >= 0).all() and (idx < n_patches).all()
