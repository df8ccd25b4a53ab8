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
