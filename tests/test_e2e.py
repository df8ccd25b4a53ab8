"""End-to-end CLI tests: main.py training -> inference.py per-video eval,
on a generated FFPP fixture tree with the tiny test tower."""

import argparse
import json
import os
import sys
from glob import glob
from os import path

import pytest
import yaml

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

from fixtures import make_cdf_tree, make_ffpp_tree


def _write_e2e_config(tmp_path, ffpp_root):
    cfg = {
        "system": {
            "mixed_precision": "no",
            "seed": 0,
            "deterministic_training": True,
            "training_eval_interval": 2,
            "evaluation_interval": 2,
        },
        "tracking": {
            "enabled": True,
            "directory": str(tmp_path / "logs"),
            "project_name": "e2e",
            "main_metric": "deepfake/ffpp/roc_auc",
            "compare_fn": "max",
        },
        "model": {
            "name": "Detector",
            "foundation": "clip",
            "architecture": "ViT-Test",
            "decode_mode": "index",
            "decode_indices": [0, 2],
            "out_dim": [2],
            "losses": ["auc_roc"],
            "dropout": 0.0,
        },
        "trainer": {
            "name": "Trainer",
            "batch_size": 2,
            "num_workers": 0,
            "learning_rate": 1e-3,
            "max_steps": 2,
            "metrics": [{"name": "deepfake/ffpp", "types": ["accuracy", "roc_auc"]}],
        },
        "evaluator": {
            "name": "Evaluator",
            "batch_size": 4,
            "num_workers": 0,
            "metrics": [{"name": "deepfake/ffpp", "types": ["accuracy", "roc_auc"]}],
        },
        "data": {
            "num_frames": 4,
            "clip_duration": 2,
            "train": [
                {
                    "name": "FFPP",
                    "category": "Deepfake",
                    "root_dir": ffpp_root,
                    "types": ["REAL", "DF"],
                    "compressions": ["raw"],
                    "augmentation": "normal",
                }
            ],
            "eval": [
                {
                    "name": "FFPP",
                    "category": "Deepfake",
                    "root_dir": ffpp_root,
                    "types": ["REAL", "DF"],
                    "compressions": ["raw"],
                }
            ],
        },
    }
    p = tmp_path / "e2e.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


@pytest.fixture
def e2e_env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    root = make_ffpp_tree(str(tmp_path / "ffpp"))
    return tmp_path, root


def test_main_then_inference(e2e_env):
    tmp_path, ffpp_root = e2e_env
    import main as main_mod

    cfg_path = _write_e2e_config(tmp_path, ffpp_root)
    params = argparse.Namespace(cfg=cfg_path, debug=False, test=False)
    project_dir = main_mod.main(params)

    assert path.isfile(path.join(project_dir, "setting.yaml"))
    assert path.isfile(path.join(project_dir, "best_weights.pt"))
    assert path.isfile(path.join(project_dir, "last_weights.pt"))
    assert path.isfile(path.join(project_dir, "metrics.jsonl"))

    import inference as inf_mod

    args = argparse.Namespace(
        artifacts_dir=project_dir, batch_size=2, aux_file=None, weight_mode="best",
        modality="video", num_workers=0, test=False, cfg_name="setting",
    )
    report = inf_mod.main(args)
    assert "FFPP" in report
    assert 0.0 <= report["FFPP"]["roc_auc"] <= 1.0
    reports = glob(path.join(project_dir, "report_*_best_video.json"))
    assert reports
    saved = json.load(open(reports[0]))
    assert saved == report

    # clip modality exercises the other ensemble path
    args.modality = "clip"
    report2 = inf_mod.main(args)
    assert "FFPP" in report2


def test_ssl_backbone_feeds_detector(e2e_env):
    """An ssl_train.py teacher backbone loads as the Detector's dinov2
    encoder via model.pretrained (the SSL -> supervised loop the reference
    never closes)."""
    import numpy as np

    import main as main_mod
    from dfd_clip_tpu.config import CN
    from dfd_clip_tpu.models import weights as weights_lib
    from dfd_clip_tpu.models.detector import Detector
    from dfd_clip_tpu.models.dinov2_vit import ARCHITECTURES, init_dinov2
    import jax

    tmp_path, _ = e2e_env
    arch = ARCHITECTURES["ViT-Test"]
    backbone = init_dinov2(jax.random.key(7), arch)
    ckpt = str(tmp_path / "teacher_backbone.pt")
    weights_lib.save_params(ckpt, {"backbone": weights_lib.to_numpy_tree(backbone)})

    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg({
        "foundation": "dinov2", "architecture": "ViT-Test",
        "decode_mode": "index", "decode_indices": [0, 1],
        "out_dim": [2], "losses": ["auc_roc"], "pretrained": ckpt,
    })
    det = Detector(cfg, num_frames=4)
    wrapper = CN(new_allowed=True)
    wrapper.model = cfg
    main_mod.load_pretrained_encoder(det, wrapper)
    assert det.pretrained_encoder is not None
    np.testing.assert_array_equal(
        np.asarray(det.pretrained_encoder["class_embedding"]),
        np.asarray(backbone["class_embedding"]),
    )


def test_training_is_deterministic(e2e_env):
    """Two identical runs produce bit-identical losses (XLA determinism +
    threaded PRNG keys; replaces the reference's cudnn/cublas knobs)."""
    import numpy as np

    from dfd_clip_tpu.data.datasets import FFPP
    from dfd_clip_tpu.engine import Trainer
    from dfd_clip_tpu.runtime import MeshRuntime
    from fixtures import ffpp_config, tiny_detector

    _, ffpp_root = e2e_env
    runtime = MeshRuntime()

    def run_once():
        det = tiny_detector()
        ds = FFPP(ffpp_config(ffpp_root), num_frames=4, clip_duration=2,
                  runtime=runtime, split="train", index=0, seed=0)
        cfg = Trainer.get_default_config()
        cfg.max_steps = 2
        cfg.batch_size = 2 if runtime.data_parallel == 1 else 1
        cfg.num_workers = 0
        tr = Trainer(cfg, runtime, det, [ds], seed=0)
        losses = []
        tr.add_callback("on_batch_end",
                        lambda t: losses.append(np.asarray(t.batch_losses["deepfake/ffpp"])))
        tr.run()
        return losses

    a, b = run_once(), run_once()
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(la, lb)


def test_inference_aux_file_and_attn_mode(e2e_env):
    """--aux_file merges extra eval datasets; attn_mode=temporal+frame runs
    through the full Detector (factorized softmax, src/models.py:105-115)."""
    import numpy as np
    import yaml

    import inference as inf_mod
    import main as main_mod
    from fixtures import make_cdf_tree

    tmp_path, ffpp_root = e2e_env
    cdf_root = make_cdf_tree(str(tmp_path / "cdf"))

    cfg_path = _write_e2e_config(tmp_path, ffpp_root)
    cfg = yaml.safe_load(open(cfg_path))
    cfg["model"]["op_mode"] = {"temporal_position": 1, "attn_mode": "temporal+frame"}
    cfg_path2 = str(tmp_path / "e2e_attn.yaml")
    yaml.safe_dump(cfg, open(cfg_path2, "w"))

    project_dir = main_mod.main(
        argparse.Namespace(cfg=cfg_path2, debug=False, test=False)
    )

    aux = {"data": {"eval": [{
        "category": "Deepfake", "name": "CDF", "pack": 1,
        "root_dir": cdf_root, "scale": 1.0,
    }]}}
    aux_path = str(tmp_path / "aux.yaml")
    yaml.safe_dump(aux, open(aux_path, "w"))

    report = inf_mod.main(argparse.Namespace(
        artifacts_dir=project_dir, batch_size=2, aux_file=aux_path,
        weight_mode="best", modality="video", num_workers=0, test=False,
        cfg_name="setting",
    ))
    assert "FFPP" in report and "CDF" in report
    assert np.isfinite(report["CDF"]["roc_auc"])


def test_cross_manipulation_recipe(e2e_env):
    """The headline experiment shape: train on REAL+DF, evaluate on the
    held-out F2F manipulation (scripts/cross-manipulation-*.sh semantics)."""
    import yaml

    import main as main_mod
    from fixtures import make_ffpp_tree

    tmp_path, _ = e2e_env
    root = make_ffpp_tree(str(tmp_path / "ffpp3"), types=("REAL", "DF", "F2F"))

    cfg_path = _write_e2e_config(tmp_path, root)
    cfg = yaml.safe_load(open(cfg_path))
    cfg["data"]["train"][0]["types"] = ["REAL", "DF"]
    cfg["data"]["eval"][0]["types"] = ["REAL", "F2F"]  # held-out manipulation
    cfg["tracking"]["project_name"] = "xmanip"
    p = str(tmp_path / "xmanip.yaml")
    yaml.safe_dump(cfg, open(p, "w"))

    run_dir = main_mod.main(argparse.Namespace(cfg=p, debug=False, test=False))
    assert path.isfile(path.join(run_dir, "best_weights.pt"))

    import inference as inf_mod

    report = inf_mod.main(argparse.Namespace(
        artifacts_dir=run_dir, batch_size=2, aux_file=None, weight_mode="best",
        modality="video", num_workers=0, test=False, cfg_name="setting",
    ))
    assert "FFPP" in report  # evaluated on the held-out manipulation
