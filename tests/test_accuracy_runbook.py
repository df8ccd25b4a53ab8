"""CI smoke for the accuracy-reproduction runbook
(scripts/reproduce_accuracy.py): the full glue — config rewrite, train via
main.py, per-video inference, table assembly, resume — runs end-to-end on
the synthetic fixture tree with the tiny tower. Real FF++ data and the real
CLIP checkpoint only swap the inputs (docs/ACCURACY.md)."""

import importlib.util
import json
import sys
from os import path

import pytest
import yaml

sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))

from fixtures import make_ffpp_tree


def _load_runbook():
    spec = importlib.util.spec_from_file_location(
        "reproduce_accuracy",
        path.join(path.dirname(path.dirname(path.abspath(__file__))),
                  "scripts", "reproduce_accuracy.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_cfg_dir(tmp_path, ffpp_root, name="df"):
    """A minimal cross-manipulation-shaped config dir with one run yaml."""
    metrics = [{"name": "deepfake/ffpp", "types": ["accuracy", "roc_auc"]}]
    cfg = {
        "system": {"mixed_precision": "no", "seed": 0,
                   "deterministic_training": True,
                   "training_eval_interval": 2, "evaluation_interval": 2},
        "tracking": {"enabled": True, "directory": str(tmp_path / "logs"),
                     "project_name": name.upper(),
                     "main_metric": "deepfake/ffpp/roc_auc",
                     "compare_fn": "max"},
        "model": {"name": "Detector", "foundation": "clip",
                  "architecture": "ViT-Test", "decode_mode": "index",
                  "decode_indices": [0, 2], "out_dim": [2],
                  "losses": ["auc_roc"], "dropout": 0.0},
        "trainer": {"name": "Trainer", "batch_size": 2, "num_workers": 0,
                    "learning_rate": 1e-3, "max_steps": 4,
                    "metrics": metrics},
        "evaluator": {"name": "Evaluator", "batch_size": 4,
                      "num_workers": 0, "metrics": metrics},
        "data": {
            "num_frames": 4, "clip_duration": 2,
            "train": [{"name": "FFPP", "category": "Deepfake",
                       "root_dir": ffpp_root, "types": ["REAL", "DF"],
                       "compressions": ["raw"], "augmentation": "normal"}],
            "eval": [{"name": "FFPP", "category": "Deepfake",
                      "root_dir": ffpp_root, "types": ["REAL", "DF"],
                      "compressions": ["raw"]}],
        },
    }
    d = tmp_path / "cfgs"
    d.mkdir()
    (d / f"{name}.yaml").write_text(yaml.safe_dump(cfg))
    return str(d)


@pytest.fixture
def runbook_env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("DFD_VIDEO_BACKEND", "opencv")
    root = make_ffpp_tree(str(tmp_path / "ffpp"))
    return tmp_path, root


def test_runbook_end_to_end_and_resume(runbook_env):
    tmp_path, ffpp_root = runbook_env
    rb = _load_runbook()
    cfg_dir = _write_cfg_dir(tmp_path, ffpp_root)
    out = str(tmp_path / "acc.json")

    rc = rb.main(["--cfg-dir", cfg_dir, "--manipulations", "df",
                  "--skip-parity", "--max-steps", "2", "--out", out])
    assert rc == 0
    report = json.load(open(out))
    assert "df" in report["rows"]
    assert 0.0 <= report["rows"]["df"]["roc_auc"] <= 100.0
    assert "| AUROC |" in report["table_markdown"]
    assert "(published AUROC)" in report["table_markdown"]

    # resume: a finished run (weights + report present) is reused — no
    # second training happens, and the numbers round-trip identically
    import main as main_mod

    def boom(*a, **k):  # pragma: no cover - only fires on regression
        raise AssertionError("resume must not retrain a finished run")

    orig = main_mod.main
    main_mod.main = boom
    try:
        rc2 = rb.main(["--cfg-dir", cfg_dir, "--manipulations", "df",
                       "--skip-parity", "--max-steps", "2", "--out", out])
    finally:
        main_mod.main = orig
    assert rc2 == 0
    report2 = json.load(open(out))
    assert report2["rows"] == report["rows"]


def test_runbook_data_layout_check(runbook_env, tmp_path):
    _, ffpp_root = runbook_env
    rb = _load_runbook()
    problems = rb.check_data_tree(ffpp_root, ["raw"], ["REAL", "DF"])
    assert problems == []
    problems = rb.check_data_tree(str(tmp_path / "nope"), ["raw"], ["REAL"])
    assert problems
    # a root missing one manipulation dir reports exactly that path
    problems = rb.check_data_tree(ffpp_root, ["raw"], ["REAL", "FS"])
    assert any("FS" in p for p in problems)


def test_runbook_requires_checkpoint_for_parity(runbook_env):
    tmp_path, ffpp_root = runbook_env
    rb = _load_runbook()
    cfg_dir = _write_cfg_dir(tmp_path, ffpp_root)
    with pytest.raises(SystemExit, match="checkpoint"):
        rb.main(["--cfg-dir", cfg_dir, "--manipulations", "df",
                 "--checkpoint", str(tmp_path / "missing.pt")])
