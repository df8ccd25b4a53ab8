"""End-to-end int8 accuracy gate (round-2 verdict #4, codec-ablation pattern).

op_mode.compute_int8 runs the frozen encoder's qkv + MLP GEMMs as W8A8 — the
production-inference throughput path (bench.py). The drift test in
tests/test_models.py bounds per-op cosine on synthetic towers; this gate
checks the claim that actually matters: a model TRAINED bf16 and SCORED
int8 must preserve the detection signal (AUROC) end to end, because the
quantization perturbs the very K/V stream the decoder attends.
"""

import os
from os import path

import numpy as np
import pytest

from dfd_clip_tpu.config import CN
from dfd_clip_tpu.data.datasets import FFPP
from dfd_clip_tpu.engine import Evaluator, Trainer
from dfd_clip_tpu.engine.callbacks import (
    compute_metrics,
    init_metrics,
    update_metrics,
)
from dfd_clip_tpu.runtime import MeshRuntime

from fixtures import ffpp_config, tiny_detector
from test_learning import make_adversarial_ffpp_tree, make_separable_ffpp_tree


def _auroc(root, runtime, trainer) -> float:
    ds = FFPP(ffpp_config(root, random_speed=0, augmentation="none"),
              num_frames=4, clip_duration=2, runtime=runtime, split="test",
              index=0)
    cfg = Evaluator.get_default_config()
    cfg.batch_size = 4
    cfg.num_workers = 0
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    ev = Evaluator(cfg, runtime, [ds])
    ev.add_callback("on_evaluation_start", init_metrics)
    ev.add_callback("on_batch_end", update_metrics)
    ev.add_callback("on_evaluation_end", compute_metrics, training_eval_interval=1)
    ev.run(trainer)
    return float(ev.computed_metrics["metric/deepfake/ffpp/roc_auc"])


def test_bf16_trained_int8_scored_auroc_holds(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    root = make_separable_ffpp_tree(str(tmp_path / "ffpp"))

    runtime = MeshRuntime()
    det = tiny_detector()
    train_ds = FFPP(ffpp_config(root, random_speed=0), num_frames=4,
                    clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 30
    cfg.batch_size = 16 // runtime.data_parallel or 1
    cfg.num_workers = 0
    cfg.learning_rate = 3e-3
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    trainer = Trainer(cfg, runtime, det, [train_ds])
    trainer.run()

    auc_bf16 = _auroc(root, runtime, trainer)

    # Same trained params, int8 compute path at scoring time.
    det_int8 = tiny_detector(op_mode={"temporal_position": 1, "compute_int8": 1})
    assert bool(det_int8.op_mode.compute_int8)
    trainer.model = det_int8
    auc_int8 = _auroc(root, runtime, trainer)

    # The full production-bench config: W8A8 GEMMs + per-row int8 K/V that
    # stays quantized into the decoder (op_mode.kv_dtype="int8_rows").
    det_rows = tiny_detector(op_mode={
        "temporal_position": 1, "compute_int8": 1, "kv_dtype": "int8_rows"})
    trainer.model = det_rows
    auc_rows = _auroc(root, runtime, trainer)

    assert auc_bf16 > 0.9, f"bf16 AUROC {auc_bf16} (fixture not learnable?)"
    assert auc_int8 > 0.9, f"int8 scoring broke the signal: AUROC {auc_int8}"
    assert abs(auc_bf16 - auc_int8) < 0.05, (auc_bf16, auc_int8)
    assert auc_rows > 0.9, f"int8_rows K/V broke the signal: AUROC {auc_rows}"
    assert abs(auc_bf16 - auc_rows) < 0.05, (auc_bf16, auc_rows)


def test_int8_auroc_delta_on_adversarial_fixture(tmp_path, monkeypatch):
    """Round-5 hardening of the gate (round-4 verdict weak #5): the
    separable fixture's 140-gray margin means int8 drift could never
    reorder a score — "AUROC holds" was trivially true. This fixture
    (make_adversarial_ffpp_tree) has near-boundary margins, per-video
    difficulty spread, disjoint train/test identities, AND a train->test
    compression shift (MJPG q95 -> q30, the FF++ c23/c40 analog — the
    reference's own eval protocol, /root/reference/inference.py:135-160,
    scores exactly such shifted compressions). The bf16 AUROC must land
    strictly inside (chance, 1.0) so a quantization-induced drop is
    MEASURABLE; the gate then bounds the actual bf16->int8 delta."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    root = make_adversarial_ffpp_tree(str(tmp_path / "ffpp"))

    runtime = MeshRuntime()
    det = tiny_detector()
    train_ds = FFPP(ffpp_config(root, random_speed=0), num_frames=4,
                    clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 60
    cfg.batch_size = 16 // runtime.data_parallel or 1
    cfg.num_workers = 0
    cfg.learning_rate = 3e-3
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    trainer = Trainer(cfg, runtime, det, [train_ds])
    trainer.run()

    auc_bf16 = _auroc(root, runtime, trainer)

    det_int8 = tiny_detector(op_mode={"temporal_position": 1,
                                      "compute_int8": 1})
    trainer.model = det_int8
    auc_int8 = _auroc(root, runtime, trainer)

    det_rows = tiny_detector(op_mode={
        "temporal_position": 1, "compute_int8": 1, "kv_dtype": "int8_rows"})
    trainer.model = det_rows
    auc_rows = _auroc(root, runtime, trainer)

    # learnable but NON-TRIVIAL: scores must be reorderable by small drift
    assert auc_bf16 > 0.72, (
        f"bf16 AUROC {auc_bf16}: adversarial fixture not learnable")
    assert auc_bf16 < 0.999, (
        f"bf16 AUROC {auc_bf16} saturated — the fixture is separable again "
        "and the int8 delta below is unfalsifiable; re-harden the margins")
    eps = 0.02
    print(f"adversarial int8 gate: bf16={auc_bf16:.4f} "
          f"int8={auc_int8:.4f} (delta {auc_bf16 - auc_int8:+.4f}) "
          f"int8_rows={auc_rows:.4f} (delta {auc_bf16 - auc_rows:+.4f})")
    assert auc_int8 >= auc_bf16 - eps, (
        f"W8A8 costs {auc_bf16 - auc_int8:.4f} AUROC on the shifted eval "
        f"(bf16 {auc_bf16:.4f} -> int8 {auc_int8:.4f}), over the {eps} gate")
    assert auc_rows >= auc_bf16 - eps, (
        f"int8_rows K/V costs {auc_bf16 - auc_rows:.4f} AUROC "
        f"(bf16 {auc_bf16:.4f} -> rows {auc_rows:.4f}), over the {eps} gate")


def test_bf16_trained_megakernel_int8_attn_scored_auroc_holds(
        tmp_path, monkeypatch):
    """Round-3 chip-ladder candidates: the whole-encoder megakernel
    (DFD_MEGAKERNEL) and int8 attention (DFD_INT8_ATTN) must preserve a
    bf16-trained model's AUROC when scoring with op_mode.compute_int8.
    Contiguous keep range (decode_indices [1, 2]) — the megakernel's
    requirement — so this trains its own tiny model."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    root = make_separable_ffpp_tree(str(tmp_path / "ffpp"))

    runtime = MeshRuntime()
    det = tiny_detector(decode_indices=[1, 2])
    train_ds = FFPP(ffpp_config(root, random_speed=0), num_frames=4,
                    clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 30
    cfg.batch_size = 16 // runtime.data_parallel or 1
    cfg.num_workers = 0
    cfg.learning_rate = 3e-3
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    trainer = Trainer(cfg, runtime, det, [train_ds])
    trainer.run()

    auc_bf16 = _auroc(root, runtime, trainer)

    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")  # interpret on CPU
    monkeypatch.setenv("DFD_MEGAKERNEL", "1")
    monkeypatch.setenv("DFD_INT8_ATTN", "1")
    det_mega = tiny_detector(
        decode_indices=[1, 2],
        op_mode={"temporal_position": 1, "compute_int8": 1})
    trainer.model = det_mega
    auc_mega = _auroc(root, runtime, trainer)

    assert auc_bf16 > 0.9, f"bf16 AUROC {auc_bf16} (fixture not learnable?)"
    assert auc_mega > 0.9, (
        f"megakernel int8-attn scoring broke the signal: AUROC {auc_mega}")
    assert abs(auc_bf16 - auc_mega) < 0.05, (auc_bf16, auc_mega)


def test_int8_trained_auroc_holds(tmp_path, monkeypatch):
    """int8 TRAINING gate: the encoder is frozen even during training, so
    the W8A8 tower is usable for the training forward too (the train step's
    dominant term; the reference trains fp32/TF32 with no such option,
    src/trainer.py:98-203). A model trained WITH op_mode.compute_int8 must
    learn the separable fixture, and its AUROC must hold whether scored
    int8 (the consistent path) or bf16."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    root = make_separable_ffpp_tree(str(tmp_path / "ffpp"))

    runtime = MeshRuntime()
    det = tiny_detector(op_mode={"temporal_position": 1, "compute_int8": 1})
    train_ds = FFPP(ffpp_config(root, random_speed=0), num_frames=4,
                    clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 30
    cfg.batch_size = 16 // runtime.data_parallel or 1
    cfg.num_workers = 0
    cfg.learning_rate = 3e-3
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    trainer = Trainer(cfg, runtime, det, [train_ds])
    trainer.run()

    auc_int8 = _auroc(root, runtime, trainer)  # scored on the trained path

    det_bf16 = tiny_detector()
    trainer.model = det_bf16
    auc_bf16 = _auroc(root, runtime, trainer)

    assert auc_int8 > 0.9, f"int8-trained model failed to learn: {auc_int8}"
    assert auc_bf16 > 0.9, f"bf16 scoring of int8-trained model: {auc_bf16}"
    assert abs(auc_int8 - auc_bf16) < 0.05, (auc_int8, auc_bf16)


def test_train_through_decoder_vjp_learns(tmp_path, monkeypatch):
    """End-to-end learning through the decoder custom VJP: with the pallas
    backend forced (interpret mode on CPU), train steps route the decoder
    forward through the kernel and the backward through the hand-written
    stats-based VJP (ops/decoder_attention_vjp.py) — the trained model must
    still learn the separable fixture."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    monkeypatch.setenv("DFD_ATTENTION_BACKEND", "pallas")
    # single-chip default is the XLA decoder forward (round-4 chip A/B);
    # this test exercises the custom-VJP path, so opt in explicitly
    monkeypatch.setenv("DFD_DEC_VJP", "1")
    root = make_separable_ffpp_tree(str(tmp_path / "ffpp"))

    runtime = MeshRuntime()
    det = tiny_detector(op_mode={"temporal_position": 1})
    train_ds = FFPP(ffpp_config(root, random_speed=0), num_frames=4,
                    clip_duration=2, runtime=runtime, split="train", index=0)
    cfg = Trainer.get_default_config()
    cfg.max_steps = 30
    cfg.batch_size = 16 // runtime.data_parallel or 1
    cfg.num_workers = 0
    cfg.learning_rate = 3e-3
    cfg.metrics = [CN({"name": "deepfake/ffpp", "types": ["roc_auc"]})]
    trainer = Trainer(cfg, runtime, det, [train_ds])
    trainer.run()

    auc = _auroc(root, runtime, trainer)
    assert auc > 0.9, f"VJP-path training failed to learn: AUROC {auc}"


def test_trainer_prequantizes_frozen_tower_once():
    """With op_mode.compute_int8 the Trainer feeds its jitted grad steps a
    ONCE-prepared frozen pytree (int8 "wq" / f32 "ws" sidecar leaves,
    clip_vit.prepare_int8_params) instead of re-quantizing the full weight
    set inside every step; the pristine ``frozen`` — and therefore model
    snapshots — never see the runtime-only leaves (round-3 verdict item 3:
    "persisting prepared int8 params across steps")."""
    runtime = MeshRuntime()

    det = tiny_detector(op_mode={"temporal_position": 1, "compute_int8": 1})
    cfg = Trainer.get_default_config()
    cfg.num_workers = 0
    trainer = Trainer(cfg, runtime, det, [])

    prepped = trainer.frozen_run["encoder"]["blocks"]["attn"]["in_proj"]
    assert "wq" in prepped and "ws" in prepped
    assert str(prepped["wq"].dtype) == "int8"
    pristine = trainer.frozen["encoder"]["blocks"]["attn"]["in_proj"]
    assert "wq" not in pristine

    snap = trainer.snapshot_model_state(include_frozen=True)

    def leaf_keys(tree, out):
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.add(k)
                leaf_keys(v, out)
        return out

    assert "wq" not in leaf_keys(snap, set()), "runtime leaves leaked into snapshot"

    # bf16 default: prepare is the identity (same objects, no extra copy)
    det_bf16 = tiny_detector()
    tr_bf16 = Trainer(cfg, runtime, det_bf16, [])
    assert tr_bf16.frozen_run is tr_bf16.frozen
