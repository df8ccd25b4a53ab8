"""Same-process A/B ladder over env knobs (round 3).

Each rung sets env knobs, rebuilds + rejits the flagship predict, and
measures in THIS process — the only comparison that survives the ambient
tunnel drift (PERF.md). Knobs are read at trace time, so setting os.environ
between builds retraces with the new configuration.

Usage: python -u tools/bench_r3_ladder.py int8   # int8 ladder (default)
       python -u tools/bench_r3_ladder.py bf16   # bf16 ladder
"""

from __future__ import annotations

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it through the
# config API so CPU smoke runs don't hang on the tunnel (CLAUDE.md gotcha).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
FRAMES = 20
RES = 224

LADDERS = {
    "int8": [
        ("int8 split, no dec-stack (r2 cfg)",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "0"}, 1),
        ("int8 split + dec-stack",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1"}, 1),
        ("int8 FULL block + dec-stack",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1"}, 1),
        ("int8 full + dec-stack + fresh-acc",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1"}, 1),
        ("int8 full + stack + fresh, bf=4",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_BLOCK_FRAMES": "4"}, 1),
    ],
    "int82": [  # round-2 of the int8 ladder: fresh-acc everywhere, vary rest
        ("int8 split + fresh (no stack)",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "0",
          "DFD_FRESH_ACC": "1"}, 1),
        ("int8 full + fresh (no stack)",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "0",
          "DFD_FRESH_ACC": "1"}, 1),
        ("int8 full + fresh + stack, bf=1",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_BLOCK_FRAMES": "1"}, 1),
        ("int8 split + fresh + FUSED_FRAMES=8",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_FUSED_FRAMES": "8"}, 1),
        ("int8 split + fresh + MLP_FRAMES=4",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_MLP_FRAMES": "4"}, 1),
        ("int8 full + fresh + DEC_TILE=1024",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_DEC_TILE": "1024"}, 1),
        ("int8 full + fresh + DEC_TILE=2048",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_DEC_TILE": "2048"}, 1),
    ],
    "phase": [
        ("int8 full + fresh (frame-major)",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1"}, 1),
        ("int8 full + fresh + PHASE_MAJOR",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "1"}, 1),
        ("int8 full + fresh + PHASE_MAJOR bf=4",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "1",
          "DFD_BLOCK_FRAMES": "4"}, 1),
        ("int8 full + fresh + PHASE_MAJOR bf=1",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "1",
          "DFD_BLOCK_FRAMES": "1"}, 1),
    ],
    "phase2": [
        ("int8 full + fresh + PHASE=mlp bf=2",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "mlp"}, 1),
        ("int8 full + fresh + PHASE=mlp bf=4",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "mlp",
          "DFD_BLOCK_FRAMES": "4"}, 1),
        ("int8 full + fresh (control)",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1"}, 1),
    ],
    "attn": [
        ("int8 full + fresh + PHASE=attn bf=2",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "attn"}, 1),
        ("int8 full + fresh + PHASE=mlp bf=2 (ctl)",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "mlp"}, 1),
    ],
    "rows": [
        ("int8 full + fresh + ROWS bf=2",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "rows"}, 1),
        ("int8 full + fresh + ROWS bf=4",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "rows",
          "DFD_BLOCK_FRAMES": "4"}, 1),
        ("int8 full + fresh + PHASE=mlp bf=2 (ctl)",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "mlp"}, 1),
    ],
    "bf16": [
        ("bf16 split, no dec-stack (r2 cfg)",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "0"}, 0),
        ("bf16 split + dec-stack",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1"}, 0),
        ("bf16 split + dec-stack + fresh-acc",
         {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1",
          "DFD_FRESH_ACC": "1"}, 0),
        ("bf16 FULL block bf=1 (VMEM probe)",
         {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
          "DFD_BLOCK_FRAMES": "1"}, 0),
    ],
}

KNOB_KEYS = ["DFD_FUSED_BLOCK", "DFD_DEC_STACK", "DFD_FRESH_ACC",
             "DFD_BLOCK_FRAMES", "DFD_FUSED_FRAMES", "DFD_MLP_FRAMES",
             "DFD_DEC_TILE", "DFD_STACKED_EXPORT", "DFD_FUSED_MLP",
             "DFD_PHASE_MAJOR", "DFD_INT8_WO", "DFD_DEC_BATCHED",
             "DFD_VMEM_LIMIT_MB", "DFD_LADDER_KV_ROWS", "DFD_NO_CLAMP",
             "DFD_MEGAKERNEL", "DFD_TOWER_FRAMES", "DFD_TOWER_GROUP",
             "DFD_INT8_ATTN", "DFD_TOWER_EXPORT", "BENCH_ARCH", "DFD_ABLATE",
             "DFD_GELU_BF16", "DFD_KT_LOGITS", "DFD_ONESCOL"]

# round-3b: the int8-wo / batched-decoder-grid / VMEM-raise knob set, timed
# with the chained-slope method (chain_ladder below)
_R3B_BASE = {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
             "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "mlp"}
LADDERS["r3b"] = [
    ("A mlp-phase ctl (wo=bf16, dec=old)",
     {**_R3B_BASE, "DFD_INT8_WO": "0", "DFD_DEC_BATCHED": "0"}, 1),
    ("B +INT8_WO",
     {**_R3B_BASE, "DFD_INT8_WO": "1", "DFD_DEC_BATCHED": "0"}, 1),
    ("C +DEC_BATCHED (tiles-outer grid)",
     {**_R3B_BASE, "DFD_INT8_WO": "1", "DFD_DEC_BATCHED": "1"}, 1),
    ("D +bf=4 (needs VMEM raise)",
     {**_R3B_BASE, "DFD_INT8_WO": "1", "DFD_DEC_BATCHED": "1",
      "DFD_BLOCK_FRAMES": "4"}, 1),
    ("E full-phase bf=2 (needs VMEM raise)",
     {**_R3B_BASE, "DFD_INT8_WO": "1", "DFD_DEC_BATCHED": "1",
      "DFD_PHASE_MAJOR": "1"}, 1),
    ("F frame-major ctl (prev best)",
     {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1", "DFD_FRESH_ACC": "1",
      "DFD_INT8_WO": "0", "DFD_DEC_BATCHED": "0"}, 1),
]

# round-3c: refine around the r3b winner (full-phase bf=2 + wo + batched dec)
_R3C_BASE = {"DFD_FUSED_BLOCK": "full", "DFD_DEC_STACK": "1",
             "DFD_FRESH_ACC": "1", "DFD_PHASE_MAJOR": "1",
             "DFD_INT8_WO": "1", "DFD_DEC_BATCHED": "1"}
LADDERS["r3d"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("ctl + kv int8_rows", {**_R3C_BASE, "DFD_LADDER_KV_ROWS": "1"}, 1),
    ("ctl + kv rows + bf16 tower (no gemm int8)",
     {**_R3C_BASE, "DFD_LADDER_KV_ROWS": "1"}, 0),
]

# round-3f: rows phase mode (frame-merged GEMM M) — untested since the
# scoped-VMEM raise unblocked it; M=2x197 pads 5.6% vs 13.7% at M=197
LADDERS["r3g"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("ctl + NO_CLAMP", {**_R3C_BASE, "DFD_NO_CLAMP": "1"}, 1),
]

# round-3h: fr mode — merged-M GEMMs (rows) + full-phase attention
LADDERS["r3h"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("fr-phase bf=2", {**_R3C_BASE, "DFD_PHASE_MAJOR": "fr"}, 1),
    ("fr-phase bf=2 + NO_CLAMP",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "fr", "DFD_NO_CLAMP": "1"}, 1),
    ("fr-phase bf=4",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "fr", "DFD_BLOCK_FRAMES": "4"}, 1),
]

LADDERS["r3f"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("rows-phase bf=2", {**_R3C_BASE, "DFD_PHASE_MAJOR": "rows"}, 1),
    ("rows-phase bf=2 VMEM=96",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "rows", "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("rows-phase bf=4",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "rows", "DFD_BLOCK_FRAMES": "4"}, 1),
]

# round-3e: kv int8_rows after the folded-scale dequant rework (one unpack
# pass per tensor, V scale folded into the (Lt, 2H) weights, f32 K logits)
LADDERS["r3e"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("ctl + kv rows folded-deq", {**_R3C_BASE, "DFD_LADDER_KV_ROWS": "1"}, 1),
    ("ctl + kv rows + DEC_TILE=1024",
     {**_R3C_BASE, "DFD_LADDER_KV_ROWS": "1", "DFD_DEC_TILE": "1024"}, 1),
]

# round-3 megakernel: whole-encoder tower kernel (ops/pallas_tower.py) vs
# the per-layer whole-block chain. Chunk size trades the per-chunk weight
# re-stream (~83 MB int8/sweep) against VMEM; 320 frames/batch at flagship.
_MEGA = {**_R3C_BASE, "DFD_MEGAKERNEL": "1"}
LADDERS["mega"] = [
    ("ctl full-phase bf=2 (r3 winner)", dict(_R3C_BASE), 1),
    ("mega F=20 g=4", {**_MEGA, "DFD_TOWER_FRAMES": "20"}, 1),
    ("mega F=32 g=4", {**_MEGA, "DFD_TOWER_FRAMES": "32"}, 1),
    ("mega F=40 g=4 (default)", dict(_MEGA), 1),
    ("mega F=40 g=8", {**_MEGA, "DFD_TOWER_GROUP": "8"}, 1),
    ("mega F=80 g=4 VMEM=96",
     {**_MEGA, "DFD_TOWER_FRAMES": "80", "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("mega F=40 g=2", {**_MEGA, "DFD_TOWER_GROUP": "2"}, 1),
    ("mega F=20 windowed export",
     {**_MEGA, "DFD_TOWER_FRAMES": "20", "DFD_TOWER_EXPORT": "window"}, 1),
]

# round-5: re-open the knob space post-kv-pad (the 8-aligned export killed
# ~3.6 ms/batch of token-merge copies, c9f7922) — the r3/r4 ladder verdicts
# (kv int8_rows neutral, fr-phase -2 ms, bf=4 untested at full-phase) all
# predate it. ctl appears first AND last as an ambient-drift check.
LADDERS["r5"] = [
    ("ctl full-phase bf=2 (r4 winner)", dict(_R3C_BASE), 1),
    ("ctl + kv int8_rows", {**_R3C_BASE, "DFD_LADDER_KV_ROWS": "1"}, 1),
    ("ctl + NO_CLAMP", {**_R3C_BASE, "DFD_NO_CLAMP": "1"}, 1),
    ("ctl bf=4 VMEM=96",
     {**_R3C_BASE, "DFD_BLOCK_FRAMES": "4", "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("fr-phase bf=2", {**_R3C_BASE, "DFD_PHASE_MAJOR": "fr"}, 1),
    ("fr-phase bf=4 VMEM=96",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "fr", "DFD_BLOCK_FRAMES": "4",
      "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("ctl + kv rows + NO_CLAMP",
     {**_R3C_BASE, "DFD_LADDER_KV_ROWS": "1", "DFD_NO_CLAMP": "1"}, 1),
    ("ctl repeat (drift check)", dict(_R3C_BASE), 1),
]

# round-5 per-op attribution: DFD_ABLATE skips ONE stage of the phased
# whole-block kernel per rung (math-changing — perf attribution only); the
# delta vs ctl prices that stage ACROSS the full predict, i.e. net of
# whatever Mosaic was already hiding under the MXU. The "all VPU" rung
# bounds the total recoverable in-kernel time from above.
LADDERS["ablate"] = [
    ("ctl (full phased int8 block)", dict(_R3C_BASE), 1),
    ("- ln stats", {**_R3C_BASE, "DFD_ABLATE": "ln"}, 1),
    ("- quant absmax reduce", {**_R3C_BASE, "DFD_ABLATE": "scale"}, 1),
    ("- quant entirely", {**_R3C_BASE, "DFD_ABLATE": "quant"}, 1),
    ("- dequant scale mults", {**_R3C_BASE, "DFD_ABLATE": "dequant"}, 1),
    ("- softmax exp", {**_R3C_BASE, "DFD_ABLATE": "exp"}, 1),
    ("- softmax row-sum norm", {**_R3C_BASE, "DFD_ABLATE": "norm"}, 1),
    ("- attention (logits+sm+PV)", {**_R3C_BASE, "DFD_ABLATE": "attn"}, 1),
    ("- gelu", {**_R3C_BASE, "DFD_ABLATE": "gelu"}, 1),
    ("- all VPU stages",
     {**_R3C_BASE, "DFD_ABLATE": "ln,quant,dequant,attn,gelu,norm,exp"}, 1),
    ("ctl repeat (drift check)", dict(_R3C_BASE), 1),
]

# round-5b: attack the ablation ladder's two headline terms — attention
# 9.8 ms (24 tiny per-head GEMM pairs per grid step) and GELU 3.7 ms (f32
# sigmoid pass). frm = merged-frame masked attention (one (F·T, F·T)
# logits/PV pair per head + MXU ones-column row-sums); the two ablate rungs
# first split the 9.8 ms into logits vs PV GEMM shares.
LADDERS["r5c"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("- logits GEMMs (ablate)", {**_R3C_BASE, "DFD_ABLATE": "logitsgemm"}, 1),
    ("- PV GEMMs (ablate)", {**_R3C_BASE, "DFD_ABLATE": "pvgemm"}, 1),
    ("frm merged-frame attention",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "frm"}, 1),
    ("frm + gelu bf16",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "frm", "DFD_GELU_BF16": "1"}, 1),
    ("ctl + gelu bf16", {**_R3C_BASE, "DFD_GELU_BF16": "1"}, 1),
    ("frm + gelu bf16 bf=4 VMEM=96",
     {**_R3C_BASE, "DFD_PHASE_MAJOR": "frm", "DFD_GELU_BF16": "1",
      "DFD_BLOCK_FRAMES": "4", "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("ctl repeat (drift check)", dict(_R3C_BASE), 1),
]

# round-5d: the r5c decomposition pinned the whole 9.8 ms attention cost on
# the LOGITS GEMMs (7.4 ms; PV free — it contracts in MXU-native layout,
# logits forces a per-head k transpose). KT_LOGITS transposes k once per
# frame instead; ONESCOL rides the free PV GEMM for the row-sums; GELU_BF16
# reformulated to dodge the Mosaic bf16-broadcast verifier error.
LADDERS["r5d"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("ctl + KT_LOGITS", {**_R3C_BASE, "DFD_KT_LOGITS": "1"}, 1),
    ("ctl + ONESCOL", {**_R3C_BASE, "DFD_ONESCOL": "1"}, 1),
    ("ctl + GELU_BF16 (fixed form)", {**_R3C_BASE, "DFD_GELU_BF16": "1"}, 1),
    ("ctl + KT + ONESCOL",
     {**_R3C_BASE, "DFD_KT_LOGITS": "1", "DFD_ONESCOL": "1"}, 1),
    ("ctl + KT + ONESCOL + GELU16",
     {**_R3C_BASE, "DFD_KT_LOGITS": "1", "DFD_ONESCOL": "1",
      "DFD_GELU_BF16": "1"}, 1),
    ("ctl repeat (drift check)", dict(_R3C_BASE), 1),
]

# round-5e: last knob shots after r5d measured KT/ONESCOL neutral — the
# attention GEMMs are real MXU work, so try the int8 MXU for them (2x rate
# at these K-shallow shapes IF the quant passes hide), and a deeper grid
# step (bf=8 needs the full 128 MB scoped VMEM; expected Mosaic OOM, the
# ladder records FAILED gracefully).
LADDERS["r5e"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("ctl + INT8_ATTN=qk (logits int8)",
     {**_R3C_BASE, "DFD_INT8_ATTN": "qk"}, 1),
    ("ctl + INT8_ATTN=1 (logits+PV int8)",
     {**_R3C_BASE, "DFD_INT8_ATTN": "1"}, 1),
    ("ctl bf=8 VMEM=112",
     {**_R3C_BASE, "DFD_BLOCK_FRAMES": "8", "DFD_VMEM_LIMIT_MB": "112"}, 1),
    ("ctl bf=1 (dispatch check)", {**_R3C_BASE, "DFD_BLOCK_FRAMES": "1"}, 1),
    ("ctl repeat (drift check)", dict(_R3C_BASE), 1),
]

# int8 attention (logits/PV GEMMs on the int8 MXU) on top of the megakernel
LADDERS["mega2"] = [
    ("mega F=40 g=4 (ctl)", dict(_MEGA), 1),
    ("mega + INT8_ATTN", {**_MEGA, "DFD_INT8_ATTN": "1"}, 1),
    ("mega + INT8_ATTN g=8",
     {**_MEGA, "DFD_INT8_ATTN": "1", "DFD_TOWER_GROUP": "8"}, 1),
    ("mega + INT8_ATTN=qk (logits only)",
     {**_MEGA, "DFD_INT8_ATTN": "qk"}, 1),
]

# ViT-L/14 (w=1024, 24 layers): the wide-tower int8 path currently runs the
# split fused kernels (whole-block exceeds scoped VMEM at w=1024); the
# megakernel streams ONE layer's weights per grid step (~12.6 MB int8), so it
# may fit where the resident-weight whole-block cannot. Run with
# BENCH_BATCH=8 (PERF.md's ViT-L batch).
_VITL = {"BENCH_ARCH": "ViT-L/14", "DFD_INT8_WO": "1", "DFD_DEC_BATCHED": "1",
         "DFD_FRESH_ACC": "1", "DFD_DEC_STACK": "1"}
LADDERS["megaL"] = [
    ("ViT-L int8 ctl (split kernels)", dict(_VITL), 1),
    ("ViT-L whole-block VMEM=96",
     {**_VITL, "DFD_FUSED_BLOCK": "full", "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("ViT-L mega F=20 g=4 VMEM=96",
     {**_VITL, "DFD_MEGAKERNEL": "1", "DFD_TOWER_FRAMES": "20",
      "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("ViT-L mega F=40 g=4 VMEM=96",
     {**_VITL, "DFD_MEGAKERNEL": "1", "DFD_TOWER_FRAMES": "40",
      "DFD_VMEM_LIMIT_MB": "96"}, 1),
    ("ViT-L mega F=20 + INT8_ATTN VMEM=96",
     {**_VITL, "DFD_MEGAKERNEL": "1", "DFD_TOWER_FRAMES": "20",
      "DFD_INT8_ATTN": "1", "DFD_VMEM_LIMIT_MB": "96"}, 1),
]

# bf16 megakernel (weights 14.1 MB/layer double-buffered — VMEM-tighter, and
# the train step's frozen-encoder forward runs this mode)
_MEGA_BF = {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1",
            "DFD_MEGAKERNEL": "1"}
LADDERS["megabf"] = [
    ("bf16 split ctl (r2 winner)",
     {"DFD_FUSED_BLOCK": "split", "DFD_DEC_STACK": "1"}, 0),
    ("bf16 mega F=20 g=4", {**_MEGA_BF, "DFD_TOWER_FRAMES": "20"}, 0),
    ("bf16 mega F=40 g=4", dict(_MEGA_BF), 0),
    ("bf16 mega F=40 g=4 VMEM=96",
     {**_MEGA_BF, "DFD_VMEM_LIMIT_MB": "96"}, 0),
]

LADDERS["r3c"] = [
    ("ctl full-phase bf=2", dict(_R3C_BASE), 1),
    ("full-phase bf=1", {**_R3C_BASE, "DFD_BLOCK_FRAMES": "1"}, 1),
    ("ctl + DEC_TILE=1024", {**_R3C_BASE, "DFD_DEC_TILE": "1024"}, 1),
    ("ctl + DEC_TILE=2048", {**_R3C_BASE, "DFD_DEC_TILE": "2048"}, 1),
    ("ctl + VMEM=96", {**_R3C_BASE, "DFD_VMEM_LIMIT_MB": "96"}, 1),
]


def build(compute_int8: int):
    from dfd_clip_tpu.models.clip_vit import ARCHITECTURES
    from dfd_clip_tpu.models.detector import Detector

    op_mode = {"temporal_position": 1, "compute_int8": compute_int8}
    if os.environ.get("DFD_LADDER_KV_ROWS") == "1":
        op_mode["kv_dtype"] = "int8_rows"
    arch = os.environ.get("BENCH_ARCH", "ViT-B/16")
    layers = ARCHITECTURES[arch].layers  # keep-6 = the last 6 layers
    cfg = Detector.get_default_config()
    cfg.merge_from_other_cfg(
        {
            "architecture": arch,
            "decode_mode": "index",
            "decode_indices": list(range(layers - 6, layers)),
            "out_dim": [2],
            "losses": ["auc_roc"],
            "op_mode": op_mode,
        }
    )
    return Detector(cfg, num_frames=FRAMES)


def components(int8: int):
    """Decompose predict: encoder K/V export alone, decoder alone, full."""
    import jax.numpy as jnp

    os.environ.update({"DFD_FUSED_BLOCK": "full" if int8 else "split",
                       "DFD_FRESH_ACC": "1"})
    model = build(int8)
    params = model.init_params(jax.random.key(0))
    rng0 = np.random.default_rng(0)
    xd = jax.device_put(rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8))
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))

    def timeit(tag, fn, *args):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(10)]
            for o in outs:
                np.asarray(jax.tree_util.tree_leaves(o)[0])
            times.append(time.perf_counter() - t0)
        t = sorted(times)[1] / 10
        print(f"{tag:42s} {t * 1e3:8.2f} ms", flush=True)
        return t

    # stage decomposition, each with a scalar-reduced output fetch
    def pre_only(x):
        return model.preprocess(x).astype(jnp.float32).sum()

    def enc_only(p, x):
        kvs = model.encode_kv(p, model.preprocess(x))
        return kvs["k"].astype(jnp.float32).sum() + kvs["v"].astype(jnp.float32).sum()

    fn_full = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
    t_full = timeit("predict (full)", fn_full, params, xd, md)
    t_enc = timeit("preprocess + encoder K/V (+sum)", jax.jit(enc_only), params, xd)
    t_pre = timeit("preprocess only (+sum)", jax.jit(pre_only), xd)
    print(f"{'-> decoder (full - enc)':42s} {(t_full - t_enc) * 1e3:8.2f} ms",
          flush=True)
    print(f"{'-> encoder stack (enc - pre)':42s} {(t_enc - t_pre) * 1e3:8.2f} ms",
          flush=True)


def slope(int8: int = 1):
    """RTT-free stage decomposition via scan-chained slope timing
    (tools/slope_timer.py methodology — the components mode's per-call
    fetches pay the ~30 ms tunnel RTT and drown short programs)."""
    import jax.numpy as jnp

    from slope_timer import time_slope

    os.environ.update({"DFD_FUSED_BLOCK": "full" if int8 else "split",
                       "DFD_FRESH_ACC": "1" if int8 else "0"})
    model = build(int8)
    params = model.init_params(jax.random.key(0))
    rng0 = np.random.default_rng(0)
    xd = jax.device_put(rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8))
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))

    def pred(x):
        return model.predict(params, x, md)[0][0]

    def enc(x):
        kvs = model.encode_kv(params, model.preprocess(x))
        return kvs["k"].astype(jnp.float32).sum() + kvs["v"].astype(jnp.float32).sum()

    def pre(x):
        return model.preprocess(x).astype(jnp.float32).sum()

    t_pred = time_slope(pred, xd, short=2, long=8, reps=5, name="predict")
    t_enc = time_slope(enc, xd, short=2, long=8, reps=5, name="pre+encoder")
    t_pre = time_slope(pre, xd, short=2, long=12, reps=5, name="preprocess")
    print(f"{'-> decoder (pred - enc)':42s} {(t_pred - t_enc) * 1e3:8.2f} ms", flush=True)
    print(f"{'-> encoder (enc - pre)':42s} {(t_enc - t_pre) * 1e3:8.2f} ms", flush=True)
    print(f"{'clips/s (slope predict)':42s} {BATCH / t_pred:8.1f}", flush=True)


def chain(int8: int, knobs: dict | None = None):
    """RTT-immune timing via dependency-chained dispatches.

    The components/ladder windows pay a per-call tunnel cost (preprocess — a
    ~0.4 ms roofline elementwise op — 'measures' 30.6 ms, the known ~30 ms
    axon RTT), and the scan-based slope timer's remote_compile request
    exceeds the tunnel's body limit (HTTP 413). This mode instead dispatches
    N predicts where input k+1 is nudged by output k (a data dependency the
    device must honor), fetches ONLY the last result, and reports the slope
    between two chain lengths — all per-window constants (RTT, dispatch,
    fetch) cancel, and the compiled program is just predict + a cheap feed.
    """
    import jax.numpy as jnp

    os.environ.update({"DFD_FUSED_BLOCK": "full" if int8 else "split",
                       "DFD_FRESH_ACC": "1" if int8 else "0"})
    if knobs:
        os.environ.update(knobs)
    model = build(int8)
    params = model.init_params(jax.random.key(0))
    rng0 = np.random.default_rng(0)
    x_host = rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8)
    xd = jax.device_put(x_host)
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))

    def feed(x, out):
        # zero-valued nudge -> data dependency without changing values
        z = (jnp.sum(out.astype(jnp.float32)) * 0).astype(jnp.uint8)
        return x + z

    feed_j = jax.jit(feed)

    def timeit(tag, fn, short=3, long=13, reps=5):
        fn_j = jax.jit(fn)

        def window(n):
            x = xd
            out = None
            for _ in range(n):
                out = fn_j(params, x, md)
                x = feed_j(x, out)
            np.asarray(jax.tree_util.tree_leaves(out)[0])

        window(1)  # compile both programs + sync
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            window(short)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            window(long)
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (long - short))
        t = sorted(slopes)[len(slopes) // 2]
        print(f"{tag:42s} {t * 1e3:8.2f} ms  {BATCH / t:7.1f} clips/s",
              flush=True)
        return t

    # feed-only chain: measures the nudge op itself so it can be subtracted
    def feed_only(p, x, m):
        return x.astype(jnp.float32).sum()[None]

    t_feed = timeit("feed+sum only (chain overhead)", feed_only)

    def pred(p, x, m):
        return model.predict(p, x, m)[0][0]

    def enc(p, x, m):
        kvs = model.encode_kv(p, model.preprocess(x))
        return (kvs["k"].astype(jnp.float32).sum()
                + kvs["v"].astype(jnp.float32).sum())[None]

    def pre(p, x, m):
        return model.preprocess(x).astype(jnp.float32).sum()[None]

    t_pred = timeit("predict (chained slope)", pred)
    t_enc = timeit("pre+encoder (chained slope)", enc)
    t_pre = timeit("preprocess (chained slope)", pre)
    net = t_pred - t_feed
    print(f"{'predict net of feed':42s} {net * 1e3:8.2f} ms  "
          f"{BATCH / net:7.1f} clips/s", flush=True)
    print(f"{'-> decoder (pred - enc)':42s} {(t_pred - t_enc) * 1e3:8.2f} ms",
          flush=True)
    print(f"{'-> encoder (enc - pre)':42s} {(t_enc - t_pre) * 1e3:8.2f} ms",
          flush=True)
    print(f"{'-> preprocess (pre - feed)':42s} {(t_pre - t_feed) * 1e3:8.2f} ms",
          flush=True)


def layers(int8: int = 1):
    """Isolate embed vs per-layer cost: chain-time encode_kv with the
    encoder truncated at different depths (decode_indices sets `last`)."""
    import jax.numpy as jnp

    from dfd_clip_tpu.models.detector import Detector

    os.environ.update({"DFD_FUSED_BLOCK": "full" if int8 else "split",
                       "DFD_FRESH_ACC": "1" if int8 else "0"})
    rng0 = np.random.default_rng(0)
    xd = jax.device_put(rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8))
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))

    def feed(x, out):
        z = (jnp.sum(out.astype(jnp.float32)) * 0).astype(jnp.uint8)
        return x + z

    feed_j = jax.jit(feed)

    def build_depth(idx):
        cfg = Detector.get_default_config()
        cfg.merge_from_other_cfg(
            {"decode_mode": "index", "decode_indices": list(idx),
             "out_dim": [2], "losses": ["auc_roc"],
             "op_mode": {"temporal_position": 1, "compute_int8": int8}})
        return Detector(cfg, num_frames=FRAMES)

    def timeit(tag, model, short=3, long=13, reps=5):
        params = model.init_params(jax.random.key(0))

        @jax.jit
        def enc(p, x, m):
            kvs = model.encode_kv(p, model.preprocess(x))
            return (kvs["k"].astype(jnp.float32).sum()
                    + kvs["v"].astype(jnp.float32).sum())[None]

        def window(n):
            x = xd
            out = None
            for _ in range(n):
                out = enc(params, x, md)
                x = feed_j(x, out)
            np.asarray(out)

        window(1)
        slopes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            window(short)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            window(long)
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (long - short))
        t = sorted(slopes)[len(slopes) // 2]
        print(f"{tag:42s} {t * 1e3:8.2f} ms", flush=True)
        return t

    t1 = timeit("encode_kv depth-1  (layers 0..0, keep 1)", build_depth([0]))
    t6 = timeit("encode_kv depth-6  (layers 0..5, keep 6)", build_depth(range(6)))
    t12 = timeit("encode_kv depth-12 (layers 6..11, keep 6)", build_depth(range(6, 12)))
    per_layer = (t12 - t6) / 6
    print(f"{'-> per-layer (d12 - d6)/6':42s} {per_layer * 1e3:8.2f} ms", flush=True)
    print(f"{'-> embed+pre (d1 - 1 layer)':42s} {(t1 - per_layer) * 1e3:8.2f} ms",
          flush=True)


def chain_ladder(ladder):
    """Per-rung chained-slope timing (the chain() method, predict only) —
    RTT-immune, so rungs are comparable even across tunnel drift."""
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()} batch={BATCH}x{FRAMES}f "
          f"chainladder", flush=True)
    rng0 = np.random.default_rng(0)
    xd = jax.device_put(rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8))
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))
    # mask-feed: dependency chain through the tiny (B, T) mask, not the
    # 60 MB input (x-feed adds ~0.95 ms/step of HBM copy to the slope)
    feed_j = jax.jit(
        lambda m, out: jnp.logical_or(
            m, (jnp.sum(out.astype(jnp.float32)) * 0).astype(bool)))

    for tag, knobs, int8 in ladder:
        for k in KNOB_KEYS:
            os.environ.pop(k, None)
        os.environ.update(knobs)

        try:
            model = build(int8)
            params = model.prepare_params(model.init_params(jax.random.key(0)))
            fn = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])

            def window(n):
                m, out = md, None
                for _ in range(n):
                    out = fn(params, xd, m)
                    m = feed_j(m, out)
                np.asarray(out)

            window(1)  # compile + sync
        except Exception as e:
            print(f"{tag:42s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        if os.environ.get("BENCH_SMOKE") == "1":
            # glue smoke (CPU/interpret): one compiled+executed batch per
            # rung proves the rung's knob combination builds and runs;
            # timing on this path would be meaningless.
            print(f"{tag:42s} SMOKE OK", flush=True)
            continue
        short, long = 3, 13
        slopes = []
        for _ in range(5):
            t0 = time.perf_counter()
            window(short)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            window(long)
            tl = time.perf_counter() - t0
            slopes.append((tl - ts) / (long - short))
        t = sorted(slopes)[len(slopes) // 2]
        print(f"{tag:42s} {t * 1e3:8.2f} ms/batch  {BATCH / t:7.1f} clips/s",
              flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "layers":
        print(f"backend={jax.default_backend()} batch={BATCH}x{FRAMES}f layers",
              flush=True)
        layers(int8=1 if len(sys.argv) < 3 or sys.argv[2] != "bf16" else 0)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "chain":
        print(f"backend={jax.default_backend()} batch={BATCH}x{FRAMES}f chain",
              flush=True)
        chain(int8=1 if len(sys.argv) < 3 or sys.argv[2] != "bf16" else 0)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "slope":
        print(f"backend={jax.default_backend()} batch={BATCH}x{FRAMES}f slope",
              flush=True)
        slope(int8=1 if len(sys.argv) < 3 or sys.argv[2] != "bf16" else 0)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "components":
        print(f"backend={jax.default_backend()} batch={BATCH}x{FRAMES}f", flush=True)
        components(int8=1)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "chainladder":
        chain_ladder(LADDERS[sys.argv[2] if len(sys.argv) > 2 else "r3b"])
        return
    ladder = LADDERS[sys.argv[1] if len(sys.argv) > 1 else "int8"]
    print(f"backend={jax.default_backend()} batch={BATCH}x{FRAMES}f", flush=True)

    rng0 = np.random.default_rng(0)
    xd = jax.device_put(rng0.integers(0, 255, (BATCH, FRAMES, 3, RES, RES), np.uint8))
    md = jax.device_put(np.ones((BATCH, FRAMES), bool))

    for tag, knobs, int8 in ladder:
        for k in KNOB_KEYS:
            os.environ.pop(k, None)
        os.environ.update(knobs)
        model = build(int8)
        params = model.init_params(jax.random.key(0))
        fn = jax.jit(lambda p, x, m: model.predict(p, x, m)[0][0])
        try:
            np.asarray(fn(params, xd, md))  # compile+sync
        except Exception as e:  # Mosaic OOM etc. — record and continue
            print(f"{tag:42s} FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(params, xd, md) for _ in range(10)]
            for o in outs:
                np.asarray(o)
            times.append(time.perf_counter() - t0)
        t = sorted(times)[1] / 10
        print(f"{tag:42s} {t * 1e3:8.2f} ms/batch  {BATCH / t:7.1f} clips/s",
              flush=True)


if __name__ == "__main__":
    main()
