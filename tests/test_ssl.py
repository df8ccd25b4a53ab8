"""SSL sub-framework tests: losses, schedules, samplers, masking, trainer,
eval suite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfd_clip_tpu.models.clip_vit import ViTConfig
from dfd_clip_tpu.runtime import MeshRuntime
from dfd_clip_tpu.ssl import losses as loss_lib
from dfd_clip_tpu.ssl import schedules as sched_lib
from dfd_clip_tpu.ssl.masking import BlockMaskGenerator
from dfd_clip_tpu.ssl.meta_arch import SSLConfig, SSLMetaArch
from dfd_clip_tpu.ssl.samplers import EpochSampler, InfiniteSampler, ShardedInfiniteSampler

TINY_ARCH = ViTConfig(input_resolution=28, patch_size=14, width=32, layers=2,
                      heads=2, output_dim=32)


# -- schedules ------------------------------------------------------------------

def test_cosine_with_warmup():
    s = sched_lib.cosine_with_warmup(1.0, 0.0, total_steps=100, warmup_steps=10)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1.0, abs=1e-6)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)
    assert 0.4 < float(s(55)) < 0.6
    frozen = sched_lib.cosine_with_warmup(1.0, 0.0, 100, 10, freeze_steps=5)
    assert float(frozen(3)) == 0.0


def test_sqrt_lr_scaling():
    assert sched_lib.sqrt_lr_scaling(0.004, 1024) == pytest.approx(0.004)
    assert sched_lib.sqrt_lr_scaling(0.004, 256) == pytest.approx(0.002)


def test_ssl_optimizer_runs_and_decays():
    from dfd_clip_tpu.models import dinov2_vit

    params = dinov2_vit.init_dinov2(jax.random.key(0), TINY_ARCH)
    opt = sched_lib.build_ssl_optimizer(
        params, lambda s: 0.1, lambda s: 0.01, n_layers=TINY_ARCH.layers
    )
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    flat = jax.tree_util.tree_leaves(updates)
    assert all(np.isfinite(np.asarray(u)).all() for u in flat)


# -- losses ---------------------------------------------------------------------

def test_dino_loss_prefers_matching_distributions(rng):
    k = 16
    t = jnp.asarray(rng.standard_normal((2, 4, k)), jnp.float32) * 3
    center = jnp.zeros((k,))
    matched, _ = loss_lib.dino_loss(t, t, center, 0.1, jnp.asarray(0.04))
    mismatched, _ = loss_lib.dino_loss(-t, t, center, 0.1, jnp.asarray(0.04))
    assert float(matched) < float(mismatched)


def test_ibot_loss_only_counts_masked_patches(rng):
    b, p, k = 2, 8, 16
    s = jnp.asarray(rng.standard_normal((b, p, k)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, p, k)), jnp.float32)
    center = jnp.zeros((k,))
    no_mask = np.zeros((b, p), bool)
    loss0, _ = loss_lib.ibot_patch_loss(s, t, jnp.asarray(no_mask), center, 0.1, jnp.asarray(0.04))
    assert float(loss0) == pytest.approx(0.0)
    mask = no_mask.copy()
    mask[0, :4] = True
    loss1, _ = loss_lib.ibot_patch_loss(s, t, jnp.asarray(mask), center, 0.1, jnp.asarray(0.04))
    assert float(loss1) > 0.0


def test_koleo_penalizes_collapse(rng):
    spread = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    collapsed = jnp.ones((16, 8), jnp.float32) + 1e-3 * jnp.asarray(
        rng.standard_normal((16, 8)), jnp.float32
    )
    assert float(loss_lib.koleo_loss(collapsed)) > float(loss_lib.koleo_loss(spread))


def test_sinkhorn_doubly_stochastic(rng):
    logits = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    q = loss_lib.sinkhorn_knopp(logits, jnp.asarray(0.05), n_iterations=10)
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-3)


def test_sinkhorn_masked_assignments(rng):
    """Masked-patch Sinkhorn: masked columns are valid assignments, unmasked
    columns are exactly zero (they are packed away in the reference,
    ibot_patch_loss.py:63-91)."""
    n, p, k = 2, 6, 5
    logits = jnp.asarray(rng.standard_normal((n, p, k)), jnp.float32)
    mask = np.zeros((n, p), bool)
    mask[0, :3] = True
    mask[1, 2:4] = True
    q = loss_lib.sinkhorn_knopp_masked(logits, jnp.asarray(mask), jnp.asarray(0.05),
                                       n_iterations=10)
    q = np.asarray(q)
    assert np.all(q[~mask] == 0.0)
    np.testing.assert_allclose(q[mask].sum(-1), 1.0, atol=1e-3)
    # exact equivalence with the reference's pack-then-sinkhorn formulation
    packed = np.asarray(loss_lib.sinkhorn_knopp(
        jnp.asarray(np.asarray(logits)[mask]), jnp.asarray(0.05), n_iterations=10
    ))
    np.testing.assert_allclose(q[mask], packed, rtol=1e-4, atol=1e-6)


def test_meta_arch_sinkhorn_centering(rng):
    """SSLMetaArch centering=sinkhorn_knopp: runs, finite loss, centers are
    left untouched (reference skips update_center in SK mode,
    ssl_meta_arch.py:215-226)."""
    import dataclasses as dc

    arch = ViTConfig(input_resolution=28, patch_size=14, width=32, layers=1,
                     heads=2, output_dim=32)
    base = SSLConfig(arch=arch, out_dim=32, ibot_out_dim=32, local_size=14,
                     n_local_crops=2, head_hidden_dim=32, head_bottleneck_dim=16)
    g = jnp.asarray(rng.standard_normal((2, 2, 3, 28, 28)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((2, 2, 3, 14, 14)), jnp.float32)
    masks = jnp.asarray(rng.random((2, 2, 4)) < 0.5)

    for centering in ("centering", "sinkhorn_knopp"):
        cfg = dc.replace(base, centering=centering)
        meta = SSLMetaArch(cfg, compute_dtype=jnp.float32)
        student, teacher, centers = meta.init_params(jax.random.key(0))
        centers = {"dino": centers["dino"] + 0.1, "ibot": centers["ibot"] - 0.1}
        total, (metrics, new_centers) = jax.jit(meta.forward_loss)(
            student, teacher, centers, g, l, masks, jnp.asarray(0.04)
        )
        assert np.isfinite(float(total))
        if centering == "sinkhorn_knopp":
            np.testing.assert_array_equal(np.asarray(new_centers["dino"]),
                                          np.asarray(centers["dino"]))
        else:
            assert not np.allclose(np.asarray(new_centers["dino"]),
                                   np.asarray(centers["dino"]))


# -- samplers / masking ----------------------------------------------------------

def test_sharded_infinite_sampler_partitions():
    s0 = ShardedInfiniteSampler(10, seed=1, shard_index=0, num_shards=2)
    s1 = ShardedInfiniteSampler(10, seed=1, shard_index=1, num_shards=2)
    it0, it1 = iter(s0), iter(s1)
    first0 = [next(it0) for _ in range(5)]
    first1 = [next(it1) for _ in range(5)]
    assert sorted(first0 + first1) == sorted(range(10))


def test_sharded_infinite_sampler_advance_resume():
    base = [next(iter(ShardedInfiniteSampler(7, seed=3))) for _ in range(1)]
    it = iter(ShardedInfiniteSampler(7, seed=3))
    full = [next(it) for _ in range(10)]
    it2 = iter(ShardedInfiniteSampler(7, seed=3, advance=4))
    resumed = [next(it2) for _ in range(6)]
    assert resumed == full[4:]


def test_epoch_sampler():
    s = EpochSampler(size=8, dataset_len=5, seed=0)
    e0 = list(s)
    s.set_epoch(1)
    e1 = list(s)
    assert len(e0) == 8 and len(e1) == 8
    assert e0 != e1  # reshuffled


def test_block_mask_ratio():
    gen = BlockMaskGenerator(grid=8, min_ratio=0.1, max_ratio=0.5)
    rng = np.random.default_rng(0)
    masks = gen.batch_masks(10, mask_prob=0.5, rng=rng)
    assert masks.shape == (10, 64)
    n_nonempty = sum(m.any() for m in masks)
    assert n_nonempty == 5


# -- meta-arch + trainer ----------------------------------------------------------

class SyntheticImages:
    def __init__(self, n=16, size=64):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return r.integers(0, 255, (self.size, self.size, 3), dtype=np.uint8)


def test_ssl_trainer_steps_and_resume(tmp_path):
    from dfd_clip_tpu.ssl.train import SSLTrainer

    runtime = MeshRuntime()
    cfg = SSLTrainer.get_default_config()
    cfg.batch_size = 1
    cfg.max_steps = 2
    cfg.out_dim = 64
    cfg.n_local_crops = 2
    cfg.local_size = 28
    cfg.warmup_steps = 1
    cfg.warmup_teacher_temp_steps = 1
    cfg.checkpoint_interval = 2
    cfg.checkpoint_dir = str(tmp_path / "ssl_ckpt")

    trainer = SSLTrainer(cfg, runtime, SyntheticImages(size=64), arch=TINY_ARCH)
    metrics = trainer.run()
    assert np.isfinite(metrics["total"])
    assert metrics["dino"] >= 0.0 or np.isfinite(metrics["dino"])
    assert trainer.checkpointer.list_steps() == [2]

    # resume: no further steps to run
    trainer2 = SSLTrainer(cfg, runtime, SyntheticImages(size=64), arch=TINY_ARCH)
    assert trainer2.start_step == 2


# -- eval suite -------------------------------------------------------------------

@pytest.fixture(scope="module")
def blob_features():
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((3, 16)) * 5
    feats, labels = [], []
    for c in range(3):
        feats.append(centers[c] + rng.standard_normal((40, 16)))
        labels += [c] * 40
    feats = np.concatenate(feats).astype(np.float32)
    labels = np.asarray(labels)
    order = rng.permutation(len(feats))
    return feats[order], labels[order]


def test_knn_classify(blob_features):
    from dfd_clip_tpu.ssl.evals import knn_classify

    feats, labels = blob_features
    pred = knn_classify(feats[:90], labels[:90], feats[90:], k=5)
    assert (pred == labels[90:]).mean() > 0.9


def test_linear_probe(blob_features):
    from dfd_clip_tpu.ssl.evals import train_linear_probe

    feats, labels = blob_features
    _, predict = train_linear_probe(feats[:90], labels[:90], 3, epochs=20)
    assert (predict(feats[90:]) == labels[90:]).mean() > 0.9


def test_logistic_regression(blob_features):
    from dfd_clip_tpu.ssl.evals import train_logistic_regression

    feats, labels = blob_features
    predict = train_logistic_regression(feats[:90], labels[:90], 3, steps=200)
    assert (predict(feats[90:]) == labels[90:]).mean() > 0.9


def test_extract_features():
    from dfd_clip_tpu.models import dinov2_vit
    from dfd_clip_tpu.ssl.evals import extract_features

    params = dinov2_vit.init_dinov2(jax.random.key(0), TINY_ARCH)
    images = np.random.default_rng(0).standard_normal(
        (10, 3, 28, 28)
    ).astype(np.float32)
    feats = extract_features(params, TINY_ARCH, images, batch_size=4,
                             compute_dtype=jnp.float32)
    assert feats.shape == (10, TINY_ARCH.width)
    assert np.isfinite(feats).all()


def test_ssl_trainer_fsdp_sharding(tmp_path):
    """FSDP-style param sharding: leaves laid out over the data axis."""
    from dfd_clip_tpu.ssl.train import SSLTrainer

    runtime = MeshRuntime()
    cfg = SSLTrainer.get_default_config()
    cfg.batch_size = 1
    cfg.max_steps = 1
    cfg.out_dim = 64
    cfg.n_local_crops = 0
    cfg.local_size = 28
    cfg.warmup_steps = 1
    cfg.warmup_teacher_temp_steps = 1
    cfg.fsdp = 1

    trainer = SSLTrainer(cfg, runtime, SyntheticImages(size=64), arch=TINY_ARCH)
    # the stacked block qkv weight has leading dim = n_layers (2): replicated;
    # the dino head hidden (2048-dim rows)... check at least one sharded leaf
    shardings = jax.tree_util.tree_map(
        lambda x: str(getattr(x, "sharding", None)), trainer.student
    )
    flat = jax.tree_util.tree_leaves(shardings)
    assert any("'data'" in s for s in flat), flat[:5]
    metrics = trainer.run()
    assert np.isfinite(metrics["total"])


def test_local_crop_pos_embed_interpolated():
    """Local crops must get a spatially interpolated pos-embed, not a slice
    (dinov2 interpolate_pos_encoding behavior)."""
    from dfd_clip_tpu.models import dinov2_vit

    arch = ViTConfig(input_resolution=56, patch_size=14, width=32, layers=1,
                     heads=2, output_dim=32)  # 4x4 grid pretrain
    params = dinov2_vit.init_dinov2(jax.random.key(0), arch)
    x_small = jnp.zeros((1, 3, 28, 28))  # 2x2 grid local crop
    out = dinov2_vit.dinov2_forward(params, x_small, arch, jnp.float32)
    assert out["patch"].shape == (1, 4, 32)

    # the embedded positions must equal bicubic-resize of the 4x4 grid, not
    # its first 4 rows
    pos = np.asarray(params["positional_embedding"])
    grid = pos[1:].reshape(4, 4, -1)
    expected = np.asarray(jax.image.resize(
        jnp.asarray(grid), (2, 2, grid.shape[-1]), "bicubic",
        antialias=False))  # torch F.interpolate parity: no antialias
    got = np.asarray(dinov2_vit._pos_embed_for(
        params["positional_embedding"], 5, arch))[1:].reshape(2, 2, -1)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    assert not np.allclose(got.reshape(4, -1), pos[1:5])  # not a slice


def test_drop_path_and_freeze_last_layer(tmp_path):
    """drop_path: train forwards differ per rng; freeze: last-layer grads
    are zeroed before freeze_last_layer_steps."""
    from dfd_clip_tpu.models import dinov2_vit
    from dfd_clip_tpu.ssl.train import SSLTrainer

    params = dinov2_vit.init_dinov2(jax.random.key(0), TINY_ARCH)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 28, 28)),
                    jnp.float32)
    a = dinov2_vit.dinov2_forward(params, x, TINY_ARCH, jnp.float32,
                                  drop_path_rate=0.5, rng=jax.random.key(1))
    b = dinov2_vit.dinov2_forward(params, x, TINY_ARCH, jnp.float32,
                                  drop_path_rate=0.5, rng=jax.random.key(2))
    assert not np.allclose(np.asarray(a["cls"]), np.asarray(b["cls"]))
    # rate 0 is the deterministic forward
    c = dinov2_vit.dinov2_forward(params, x, TINY_ARCH, jnp.float32)
    d = dinov2_vit.dinov2_forward(params, x, TINY_ARCH, jnp.float32,
                                  drop_path_rate=0.0, rng=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(c["cls"]), np.asarray(d["cls"]))

    runtime = MeshRuntime()
    cfg = SSLTrainer.get_default_config()
    cfg.batch_size = 1
    cfg.max_steps = 1
    cfg.out_dim = 64
    cfg.n_local_crops = 0
    cfg.local_size = 28
    cfg.warmup_steps = 1
    cfg.warmup_teacher_temp_steps = 1
    cfg.freeze_last_layer_steps = 5  # > max_steps: last layer must not move
    cfg.drop_path_rate = 0.1
    trainer = SSLTrainer(cfg, runtime, SyntheticImages(size=64), arch=TINY_ARCH)
    before = np.asarray(trainer.student["dino_head"]["last_v"])
    trainer.run()
    after = np.asarray(trainer.student["dino_head"]["last_v"])
    np.testing.assert_array_equal(before, after)


def test_infinite_sampler_shards_and_advances():
    s0 = InfiniteSampler(6, seed=2, shard_index=0, num_shards=2)
    s1 = InfiniteSampler(6, seed=2, shard_index=1, num_shards=2)
    a = [next(iter(s0)) for _ in range(1)]  # noqa: F841 (construction works)
    it0, it1 = iter(s0), iter(s1)
    first = [next(it0) for _ in range(3)] + [next(it1) for _ in range(3)]
    assert sorted(first) == list(range(6))
    # advance skips the first k entries of the global stream
    it_adv = iter(InfiniteSampler(6, seed=2, shard_index=0, num_shards=1, advance=2))
    it_ref = iter(InfiniteSampler(6, seed=2, shard_index=0, num_shards=1))
    ref = [next(it_ref) for _ in range(8)]
    adv = [next(it_adv) for _ in range(6)]
    assert adv == ref[2:]


def test_linear_probe_grid(blob_features):
    from dfd_clip_tpu.ssl import evals

    feats, labels = blob_features
    train_f, train_y = feats[:90], labels[:90]
    test_f, test_y = feats[90:], labels[90:]
    params, predict, report = evals.train_linear_probe_grid(
        train_f, train_y, num_classes=int(labels.max()) + 1,
        epochs=20, batch_size=64, seed=0,
    )
    acc = float((predict(test_f) == test_y).mean())
    assert acc > 0.9, (acc, report)
    # one entry per grid member + the winner tag
    assert report["best"] in report and len(report) == 11


def test_remat_grads_match(rng):
    """cfg.remat wraps the student tower's scanned block in jax.checkpoint:
    the backward recomputes block intermediates instead of storing all of
    them (the HBM headroom that lets ViT-L/giant2 SSL batches fit a chip).
    Rematerialization must be semantics-preserving — same loss, same
    gradients as the plain scan."""
    import dataclasses as dc

    arch = ViTConfig(input_resolution=28, patch_size=14, width=32, layers=2,
                     heads=2, output_dim=32)
    base = SSLConfig(arch=arch, out_dim=32, ibot_out_dim=32, local_size=14,
                     n_local_crops=2, head_hidden_dim=32, head_bottleneck_dim=16,
                     drop_path_rate=0.1)
    g = jnp.asarray(rng.standard_normal((2, 2, 3, 28, 28)), jnp.float32)
    l = jnp.asarray(rng.standard_normal((2, 2, 3, 14, 14)), jnp.float32)
    masks = jnp.asarray(rng.random((2, 2, 4)) < 0.5)

    def run(remat):
        meta = SSLMetaArch(dc.replace(base, remat=remat),
                           compute_dtype=jnp.float32)
        student, teacher, centers = meta.init_params(jax.random.key(0))

        def loss_fn(s):
            total, _ = meta.forward_loss(s, teacher, centers, g, l, masks,
                                         jnp.asarray(0.04),
                                         rng=jax.random.key(7))
            return total

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(student)
        return float(loss), grads

    loss_plain, g_plain = run(False)
    loss_remat, g_remat = run(True)
    np.testing.assert_allclose(loss_remat, loss_plain, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_remat, g_plain,
    )
