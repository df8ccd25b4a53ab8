"""CompInv adapter pretraining path: CompInvEncoder + CompInvTrainer/Evaluator
on paired raw/c23 clips (reference configs/comp-inv-encoder/deepfake.yaml)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.data.datasets import FFPP
from dfd_clip_tpu.engine import CompInvEvaluator, CompInvTrainer
from dfd_clip_tpu.models import CompInvEncoder
from dfd_clip_tpu.models import clip_vit
from dfd_clip_tpu.runtime import MeshRuntime

from fixtures import ffpp_config, make_ffpp_tree

TINY = clip_vit.ViTConfig(
    input_resolution=32, patch_size=16, width=64, layers=3, heads=4, output_dim=32
)


def tiny_compinv(**overrides):
    cfg = CompInvEncoder.get_default_config()
    cfg.merge_from_other_cfg(
        {"decode_mode": "index", "decode_indices": [0, 2], "mode": 1,
         "adapter": {"struct": {"type": "768-x-768", "x": 32}}, **overrides}
    )
    model = CompInvEncoder(cfg, num_frames=4, compute_dtype=jnp.float32)
    model.vit_cfg = TINY
    model.adapter_cfg = dataclasses.replace(
        model.adapter_cfg, width=TINY.width, patches=TINY.num_patches, inner_dim=32
    )
    return model


@pytest.fixture
def ffpp_root(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    return make_ffpp_tree(str(tmp_path / "ffpp"))


def test_compinv_forward_losses(rng):
    model = tiny_compinv()
    params = model.init_params(jax.random.key(0))
    trainable, frozen = model.partition_params(params)
    assert "adapter" in trainable and "encoder" in frozen

    x = rng.integers(0, 255, (4, 4, 3, 32, 32), dtype=np.uint8).astype(np.float32) / 255.0
    comp_is_raw = jnp.asarray([True, False, True, False])
    recon, match = model.forward(params, jnp.asarray(x), comp_is_raw, train=True)
    assert np.isfinite(float(recon)) and np.isfinite(float(match))
    # mode 1 computes only the match term
    assert float(recon) == pytest.approx(0.0)


def test_compinv_mode0_recon(rng):
    model = tiny_compinv(mode=0)
    params = model.init_params(jax.random.key(0))
    x = rng.integers(0, 255, (2, 4, 3, 32, 32), dtype=np.uint8).astype(np.float32) / 255.0
    recon, match = model.forward(params, jnp.asarray(x),
                                 jnp.asarray([True, False]), train=True)
    assert float(recon) > 0.0  # adapter output differs from raw features


def test_compinv_trainer_and_evaluator(ffpp_root):
    runtime = MeshRuntime()
    model = tiny_compinv()

    # pair=1: each item carries both raw and c23 variants, interleaved by
    # the collate (the pairing the losses rely on)
    ds = FFPP(ffpp_config(ffpp_root, pair=1, compressions=["raw", "c23"]),
              num_frames=4, clip_duration=2, runtime=runtime, split="train", index=0)
    eval_ds = FFPP(ffpp_config(ffpp_root, pair=1, compressions=["raw", "c23"]),
                   num_frames=4, clip_duration=2, runtime=runtime, split="val", index=0)

    cfg = CompInvTrainer.get_default_config()
    cfg.max_steps = 2
    cfg.batch_size = 1
    cfg.num_workers = 0
    trainer = CompInvTrainer(cfg, runtime, model, [ds])

    ecfg = CompInvEvaluator.get_default_config()
    ecfg.batch_size = 1
    ecfg.num_workers = 0
    evaluator = CompInvEvaluator(ecfg, runtime, [eval_ds])

    before = jax.tree_util.tree_map(np.asarray, trainer.trainable)
    trainer.run()
    after = jax.tree_util.tree_map(np.asarray, trainer.trainable)
    delta = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(np.sum(np.abs(ab))),
        jax.tree_util.tree_map(lambda a, b: a - b, before, after), 0.0,
    )
    assert delta > 0.0
    assert np.isfinite(trainer.batch_losses["match"]).all()

    # the final round-robin pass legitimately leaves batch_losses empty
    # (reference src/evaluator.py:149-170 behavior); capture mid-run instead
    seen = []
    evaluator.add_callback("on_batch_end", lambda e: seen.append(dict(e.batch_losses)))
    evaluator.run(trainer)
    assert any("match" in s for s in seen)


def test_bn_adapter_eval_uses_calibrated_stats(ffpp_root):
    """768-bn: eval must use stored BatchNorm running statistics (torch
    eval-mode behavior) so a clip's output does not depend on its batch
    companions; CompInvTrainer calibrates those stats from raw encoder K/V
    at the end of the run (the functional train step cannot maintain
    torch's momentum-EMA buffers)."""
    runtime = MeshRuntime()
    model = tiny_compinv(adapter={"struct": {"type": "768-bn", "x": 32}})
    assert model.adapter_cfg.struct_type == "768-bn"

    ds = FFPP(ffpp_config(ffpp_root, pair=1, compressions=["raw", "c23"]),
              num_frames=4, clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = CompInvTrainer.get_default_config()
    cfg.max_steps = 1
    cfg.batch_size = 1
    cfg.num_workers = 0
    trainer = CompInvTrainer(cfg, runtime, model, [ds])
    init_mean = np.asarray(
        trainer.trainable["adapter"]["blocks"][0]["k"]["bn"]["mean"])
    trainer.run()
    cal_mean = np.asarray(
        trainer.trainable["adapter"]["blocks"][0]["k"]["bn"]["mean"])
    cal_var = np.asarray(
        trainer.trainable["adapter"]["blocks"][0]["k"]["bn"]["var"])
    assert not np.allclose(cal_mean, init_mean), "calibration must run"
    assert (cal_var > 0).all()

    # eval-mode output is batch-composition independent
    import dataclasses
    from dfd_clip_tpu.models import adapter as adapter_lib

    params = {**trainer.frozen, **trainer.trainable}
    rng = np.random.default_rng(0)
    xa = rng.integers(0, 255, (1, 4, 3, 32, 32), np.uint8).astype(np.float32) / 255.0
    xb = rng.integers(0, 255, (1, 4, 3, 32, 32), np.uint8).astype(np.float32) / 255.0
    kv_a, _ = model.predict(params, jnp.asarray(xa), train=False)
    kv_ab, _ = model.predict(params, jnp.asarray(np.concatenate([xa, xb])),
                             train=False)
    np.testing.assert_allclose(np.asarray(kv_a["k"][:, :1]),
                               np.asarray(kv_ab["k"][:, :1]),
                               rtol=1e-5, atol=1e-5)
