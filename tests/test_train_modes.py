"""Coverage for the remaining train_mode / dataset mode combinations:
contrast_pair, guide patch-mask, triplet temporal loss through the Trainer,
nerf_raw loss scaling, dev-mode forced augmentations."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.data.datasets import FFPP
from dfd_clip_tpu.engine import Trainer
from dfd_clip_tpu.runtime import MeshRuntime

from fixtures import ffpp_config, make_ffpp_tree, tiny_detector


@pytest.fixture(scope="module")
def runtime():
    return MeshRuntime()


@pytest.fixture
def ffpp_root(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    return make_ffpp_tree(str(tmp_path / "ffpp"))


def test_contrast_pair_mode(ffpp_root):
    """contrast_pair aligns each fake clip with the same-offset real clip
    (src/datasets.py:545-571)."""
    cfg = ffpp_config(ffpp_root, contrast=1, contrast_pair=1)
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="train", index=0)
    frames_l, labels, masks, speeds, idxs = ds[4]  # an index in the DF range
    assert labels == [0, 1]  # (real aligned clip, fake clip)
    assert len(frames_l) == 2


def test_guide_patch_mask(ffpp_root, tmp_path, rng):
    """guide patch-mask samples patch indices from a probability map
    (src/models.py:533-539)."""
    n_patches = 4  # tiny tower: 2x2 grid
    probs = np.full((n_patches,), 1.0 / n_patches)
    guide = {"v": {0: probs.copy(), 2: probs.copy()}}
    guide_path = str(tmp_path / "guide.pkl")
    with open(guide_path, "wb") as f:
        pickle.dump(guide, f)

    det = tiny_detector(train_mode={
        "patch_mask": {"type": "guide", "ratio": 0.5, "path": guide_path}
    })
    idx = det.sample_patch_indices(rng)
    assert idx.shape == (2, 2)  # 2 kept layers x (4 * 0.5) patches
    assert (idx < n_patches).all()

    params = det.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8)
    logits, _ = det.predict(params, jnp.asarray(x), jnp.ones((2, 4), bool),
                            train=True, patch_indices=jnp.asarray(idx))
    assert np.isfinite(np.asarray(logits[0])).all()


def test_triplet_loss_through_trainer(runtime, ffpp_root):
    """temporal=triplet: host-sampled speed-ordered triples reach the jitted
    step (src/models.py:706-733 semantics)."""
    det = tiny_detector(train_mode={"temporal": "triplet"})
    ds = FFPP(ffpp_config(ffpp_root), num_frames=4, clip_duration=2,
              runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 1
    cfg.batch_size = 1 if runtime.data_parallel > 1 else 4
    cfg.num_workers = 0
    trainer = Trainer(cfg, runtime, det, [ds])
    trainer.run()
    assert "speed/triplet" in trainer.batch_losses
    assert np.isfinite(trainer.batch_losses["speed/triplet"]).all()


def test_nerf_raw_scales_losses(rng):
    """nerf_raw multiplies per-sample losses by nerf_power for raw samples
    and (2 - nerf_power) for compressed ones (src/models.py:669-677)."""
    det_plain = tiny_detector()
    det_nerf = tiny_detector(train_mode={"nerf_raw": 0})
    params = det_plain.init_params(jax.random.key(0))

    b = 4
    x = rng.integers(0, 255, (b, 4, 3, 32, 32), dtype=np.uint8)
    y = [jnp.asarray(np.array([0, 1, 0, 1]))]
    m = jnp.ones((b, 4), bool)
    comp = jnp.asarray([True, False, True, False])

    base, _, _ = det_plain.forward(params, jnp.asarray(x), y, m, comp_is_raw=comp,
                                   train=True, single_task=0)
    nerfed, _, _ = det_nerf.forward(params, jnp.asarray(x), y, m, comp_is_raw=comp,
                                    train=True, single_task=0)
    base = np.asarray(base[0])
    nerfed = np.asarray(nerfed[0])
    # nerf_power=0: raw samples zeroed, compressed samples doubled
    np.testing.assert_allclose(nerfed[comp], 0.0, atol=1e-6)
    np.testing.assert_allclose(nerfed[~np.asarray(comp)], 2 * base[~np.asarray(comp)],
                               rtol=1e-5)


@pytest.mark.parametrize("spec", ["dev-mode+force-rgb", "dev-mode+force-hue",
                                  "dev-mode+force-bright"])
def test_dev_mode_forced_augmentations(ffpp_root, spec):
    cfg = ffpp_config(ffpp_root, augmentation=spec)
    ds = FFPP(cfg, num_frames=4, clip_duration=2, split="train", index=0)
    frames, *_ = ds[0]
    assert frames["raw"].shape == (4, 3, 64, 64)
