"""scripts/validate_parity.py smoke: the real-checkpoint parity tool must
run turnkey on a synthetic checkpoint in the exact format the reference's
clip.load handles (visual.*-prefixed full-CLIP state dict) and report
PARITY OK (round-1 verdict, next-round #4)."""

import json
import sys

import numpy as np
import pytest

from dfd_clip_tpu.utils.refload import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference tree or torch unavailable")

if ref is not None:
    import torch

# head_dim must be 64: infer_clip_vit_config derives heads = width // 64,
# the real-CLIP invariant (src/clip/model.py:453-496).
RES, PATCH, WIDTH, LAYERS = 64, 32, 128, 2


def _synthetic_checkpoint(path: str) -> None:
    vt = ref.clip_model.VisionTransformer(
        input_resolution=RES, patch_size=PATCH, width=WIDTH,
        layers=LAYERS, heads=WIDTH // 64, output_dim=WIDTH,
    )
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in vt.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=g))
    sd = {f"visual.{k}": v for k, v in vt.state_dict().items()}
    torch.save(sd, path)


def test_validate_parity_reports_ok(tmp_path, capsys):
    sys.path.insert(0, "scripts")
    try:
        import validate_parity
    finally:
        sys.path.pop(0)

    ckpt = str(tmp_path / "ViT-Tiny-CLIP.pt")
    report = str(tmp_path / "report.json")
    _synthetic_checkpoint(ckpt)

    rc = validate_parity.main(
        ["--checkpoint", ckpt, "--frames", "2", "--json", report]
    )
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PARITY OK" in out
    rep = json.load(open(report))
    assert rep["ok"]
    # fp32 and bf16 rows for every (layer, stream)
    assert len(rep["layers"]) == 2 * 2 * LAYERS
    fp32_rows = [r for r in rep["layers"] if r["dtype"] == "float32"]
    assert all(r["max_abs"] < 1e-3 for r in fp32_rows)
    assert all(r["cosine"] > 0.999 for r in fp32_rows)
