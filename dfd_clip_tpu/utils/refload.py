"""Load the upstream reference's torch modules as a golden parity oracle.

The reference implementation (ODD2/DFD-CLIP) ships torch modules whose exact
numerics this framework re-architects: the K/V-exporting CLIP visual tower
(src/clip/model.py:171-294) and the dual-activation temporal decoder
(src/models.py:81-361). Importing those modules directly — rather than
re-writing them — gives parity tests an oracle that cannot share a
misreading with the JAX port: if either side diverges from the reference
math, the comparison fails.

The reference tree is not an installable package and pulls CUDA-era
dependencies (yacs, torchvision, ftfy) that are absent here, so the loader
imports only the two needed module *files* via importlib with minimal stub
modules. Nothing from the reference is executed at import time beyond class
definitions.

Used by tests/test_torch_golden.py and scripts/validate_parity.py. Returns
None when the reference tree or torch is unavailable (standalone installs),
in which case callers skip.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from typing import Optional

DEFAULT_REFERENCE_ROOT = "/root/reference"

_cache: dict = {}


def _load_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference(root: Optional[str] = None):
    """Import the reference's clip-model and models modules.

    Returns a namespace with ``.clip_model`` (src/clip/model.py) and
    ``.models`` (src/models.py), or None if the reference tree / torch is
    missing. Results are cached per root.
    """
    root = root or os.environ.get("DFD_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)
    if root in _cache:
        return _cache[root]

    clip_path = os.path.join(root, "src", "clip", "model.py")
    models_path = os.path.join(root, "src", "models.py")
    if not (os.path.exists(clip_path) and os.path.exists(models_path)):
        _cache[root] = None
        return None
    try:
        import torch  # noqa: F401
    except Exception:
        _cache[root] = None
        return None

    # src/models.py does `from . import clip` and only touches clip.load /
    # clip.model classes; build a minimal package skeleton around the two
    # real module files.
    pkg = types.ModuleType("dfd_ref_src")
    pkg.__path__ = [os.path.join(root, "src")]
    sys.modules["dfd_ref_src"] = pkg
    clip_pkg = types.ModuleType("dfd_ref_src.clip")
    clip_pkg.__path__ = [os.path.join(root, "src", "clip")]
    sys.modules["dfd_ref_src.clip"] = clip_pkg

    clip_model = _load_module("dfd_ref_src.clip.model", clip_path)
    clip_pkg.model = clip_model
    pkg.clip = clip_pkg

    # models.py module-scope imports we don't want to require: yacs (our
    # first-party CfgNode is API-compatible) and torchvision (only used by
    # Detector._transform, which parity tests never call).
    from ..config import CfgNode

    _stub("yacs")
    _stub("yacs.config", CfgNode=CfgNode)
    tvt = _stub("torchvision.transforms")
    _stub("torchvision", transforms=tvt)

    models = _load_module("dfd_ref_src.models", models_path)

    ns = types.SimpleNamespace(clip_model=clip_model, models=models, root=root)
    _cache[root] = ns
    return ns


def load_reference_module(relpath: str, root: Optional[str] = None):
    """Import one self-contained reference module file (e.g. the dinov2
    swiglu_ffn layer) without package plumbing. Returns None if missing."""
    root = root or os.environ.get("DFD_REFERENCE_ROOT", DEFAULT_REFERENCE_ROOT)
    path = os.path.join(root, relpath)
    key = ("module", path)
    if key in _cache:
        return _cache[key]
    if not os.path.exists(path):
        _cache[key] = None
        return None
    name = "dfd_ref_" + relpath.replace("/", "_").removesuffix(".py")
    mod = _load_module(name, path)
    _cache[key] = mod
    return mod
