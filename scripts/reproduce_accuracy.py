#!/usr/bin/env python
"""One-command reproduction of the reference's headline accuracy table.

Given FaceForensics++ data and the OpenAI CLIP ViT-B/16 checkpoint under
misc/, this runs the canonical leave-one-out cross-manipulation recipe
(/root/reference/README.md:21-37: train on 3 manipulations + REAL for 3k
steps, score ALL 1-sec clips of every held-out-set video, average softmax
probabilities) and emits the accuracy/AUROC table in the reference README's
format, next to the published numbers (BASELINE.md).

Usage (the one command):
    python scripts/reproduce_accuracy.py --data /data/ffpp

Prerequisites it checks before burning compute:
  * misc/ViT-B-16.pt (or any checkpoint main.py's discovery list accepts) —
    no network egress is assumed anywhere;
  * the torch-vs-JAX parity gate (scripts/validate_parity.py) passes on that
    checkpoint, so a conversion bug cannot masquerade as an accuracy gap;
  * the FF++ tree has the layout data/datasets.py expects
    (<root>/<comp>/<TYPE>/videos/*.avi + the csv splits).

Every stage is resumable: finished runs are detected by their report files
and skipped, so a crashed sweep continues where it stopped.

CI smoke: tests/test_accuracy_runbook.py drives this script end-to-end on
the synthetic fixture tree with a tiny config dir — the glue is exercised
every run; only the real data/weights are environmental.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
from os import path

sys.path.append(path.dirname(path.dirname(path.abspath(__file__))))

# the reference table rows (BASELINE.md; /root/reference/README.md:30-37)
PUBLISHED = {
    "df": {"accuracy": 97.8, "roc_auc": 100.0},
    "f2f": {"accuracy": 96.0, "roc_auc": 99.8},
    "fs": {"accuracy": 90.4, "roc_auc": 97.9},
    "nt": {"accuracy": 94.4, "roc_auc": 97.5},
}
LABEL = {"df": "DF", "f2f": "F2F", "fs": "FS", "nt": "NT"}


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data", default=None,
                   help="FF++ root override (default: the configs' root_dir)")
    p.add_argument("--cfg-dir", default="configs/cross-manipulation/raw",
                   help="config dir with one <manipulation>.yaml per run")
    p.add_argument("--manipulations", nargs="+",
                   default=["df", "f2f", "fs", "nt"],
                   help="held-out manipulations (= config file stems)")
    p.add_argument("--checkpoint", default="misc/ViT-B-16.pt",
                   help="CLIP checkpoint for the parity gate")
    p.add_argument("--skip-parity", action="store_true",
                   help="skip the torch-vs-JAX checkpoint parity gate")
    p.add_argument("--max-steps", type=int, default=None,
                   help="override trainer.max_steps (smoke runs)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="override trainer batch size (smoke runs)")
    p.add_argument("--out", default="accuracy_report.json",
                   help="write the machine-readable report here")
    p.add_argument("--logs", default=None,
                   help="override tracking.directory (run artifacts root)")
    return p


def check_data_tree(root: str, comps, types) -> list:
    """Return a list of human-readable problems with the FF++ layout
    (data/datasets.py FFPP: <root>/<TYPE_DIR>/<comp>/videos/ + splits/*.json,
    REAL's dir is lowercase 'real' like the reference's tree)."""
    type_dirs = {"REAL": "real", "DF": "DF", "FS": "FS", "F2F": "F2F",
                 "NT": "NT"}
    problems = []
    if not path.isdir(root):
        return [f"data root {root!r} does not exist"]
    for comp in comps:
        for t in types:
            d = path.join(root, type_dirs.get(t, t), comp, "videos")
            if not path.isdir(d):
                problems.append(f"missing {d}")
            elif not any(os.scandir(d)):
                problems.append(f"empty {d}")
    for split in ("train", "val", "test"):
        json_split = path.join(root, "splits", f"{split}.json")
        if not path.isfile(json_split):
            problems.append(f"missing split file {json_split}")
    return problems


def parity_gate(checkpoint: str) -> None:
    """Run scripts/validate_parity.py as a subprocess gate (it imports torch
    and builds the reference tower; isolation keeps this process lean)."""
    cmd = [sys.executable, path.join(path.dirname(__file__),
                                     "validate_parity.py"),
           "--checkpoint", checkpoint]
    print(f"[runbook] parity gate: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd)
    if r.returncode != 0:
        raise SystemExit(
            f"checkpoint parity gate FAILED (exit {r.returncode}): the "
            "converted tower disagrees with the torch reference — fix the "
            "conversion before any accuracy run (or --skip-parity to "
            "proceed anyway)")


def _load_cfg(cfg_path: str, args):
    """Load a run yaml and apply the runbook's overrides, returning the
    (possibly rewritten) config path."""
    import yaml

    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    changed = False
    if args.data:
        for section in ("train", "eval"):
            for ds in cfg.get("data", {}).get(section, []) or []:
                if "root_dir" in ds:
                    ds["root_dir"] = args.data
                    changed = True
    if args.max_steps is not None:
        cfg.setdefault("trainer", {})["max_steps"] = args.max_steps
        changed = True
    if args.batch_size is not None:
        cfg.setdefault("trainer", {})["batch_size"] = args.batch_size
        cfg.setdefault("evaluator", {})["batch_size"] = args.batch_size
        changed = True
    if args.logs:
        cfg.setdefault("tracking", {})["directory"] = args.logs
        changed = True
    if not changed:
        return cfg_path
    out = cfg_path + ".runbook.yaml"
    with open(out, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return out


def run_one(m: str, args) -> dict:
    """Train + per-video inference for one held-out manipulation; returns
    the report row. Reuses a finished run's report when present (resume)."""
    import main as main_mod

    cfg_path = path.join(args.cfg_dir, f"{m}.yaml")
    if not path.isfile(cfg_path):
        raise SystemExit(f"no config for manipulation {m!r}: {cfg_path}")
    cfg_path = _load_cfg(cfg_path, args)

    import yaml

    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)
    # main.py resolves tracking.directory against the repo root, not cwd,
    # and places each run in a timestamped dir under the project name
    tracking_dir = cfg["tracking"]["directory"]
    if not path.isabs(tracking_dir):
        tracking_dir = path.join(path.dirname(path.dirname(
            path.abspath(__file__))), tracking_dir)
    project = cfg["tracking"].get("project_name")
    run_dirs = sorted(glob.glob(path.join(tracking_dir, project, "*"))
                      ) if project else []
    trained = [d for d in run_dirs
               if path.isfile(path.join(d, "best_weights.pt"))]

    for d in reversed(trained):
        existing = sorted(glob.glob(
            path.join(d, "report_*_best_video.json")))
        if existing:
            print(f"[runbook] {m}: reusing finished run {d}", flush=True)
            with open(existing[-1]) as f:
                return json.load(f)

    if trained:
        project_dir = trained[-1]
        print(f"[runbook] {m}: weights exist in {project_dir}, "
              "skipping train", flush=True)
    else:
        print(f"[runbook] {m}: training ({cfg_path})", flush=True)
        project_dir = main_mod.main(
            argparse.Namespace(cfg=cfg_path, debug=False, test=False))

    import inference as inf_mod

    print(f"[runbook] {m}: per-video inference on {project_dir}", flush=True)
    report = inf_mod.main(argparse.Namespace(
        artifacts_dir=project_dir, batch_size=cfg["evaluator"]["batch_size"],
        aux_file=None, weight_mode="best", modality="video", num_workers=0,
        test=False, cfg_name="setting"))
    return report


def format_table(rows: dict) -> str:
    """The reference README's table shape: one column per held-out set."""
    ms = list(rows)
    head = "| Metric | " + " | ".join(LABEL.get(m, m.upper()) for m in ms) + " |"
    sep = "|---" * (len(ms) + 1) + "|"
    acc = "| Accuracy | " + " | ".join(
        f"{rows[m]['accuracy']:.1f}" for m in ms) + " |"
    auc = "| AUROC | " + " | ".join(
        f"{rows[m]['roc_auc']:.1f}" for m in ms) + " |"
    pub = "| (published AUROC) | " + " | ".join(
        f"{PUBLISHED[m]['roc_auc']:.1f}" if m in PUBLISHED else "-"
        for m in ms) + " |"
    return "\n".join([head, sep, acc, auc, pub])


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    if not args.skip_parity:
        if not path.isfile(args.checkpoint):
            raise SystemExit(
                f"checkpoint {args.checkpoint!r} not found — place the "
                "OpenAI CLIP ViT-B/16 checkpoint under misc/ (docs/"
                "ACCURACY.md lists offline acquisition options), or pass "
                "--skip-parity for random-init smoke runs")
        parity_gate(args.checkpoint)

    if args.data:
        # probe the first config's dataset spec for the expected layout
        import yaml

        with open(path.join(args.cfg_dir,
                            f"{args.manipulations[0]}.yaml")) as f:
            cfg0 = yaml.safe_load(f)
        ds0 = (cfg0.get("data", {}).get("train") or [{}])[0]
        problems = check_data_tree(
            args.data, ds0.get("compressions", ["raw"]),
            ds0.get("types", ["REAL"]))
        if problems:
            for p in problems:
                print(f"[runbook] data check: {p}", file=sys.stderr)
            raise SystemExit(f"FF++ tree at {args.data!r} failed "
                             f"{len(problems)} layout checks (above)")

    rows = {}
    for m in args.manipulations:
        report = run_one(m, args)
        # the FFPP eval row (inference.py keys by dataset class)
        key = next((k for k in report if k.startswith("FFPP")), None)
        if key is None:
            raise SystemExit(f"{m}: no FFPP row in the inference report "
                             f"(got {list(report)})")
        rows[m] = {
            "accuracy": 100.0 * report[key]["accuracy"],
            "roc_auc": 100.0 * report[key]["roc_auc"],
        }
        print(f"[runbook] {m}: accuracy {rows[m]['accuracy']:.2f} "
              f"AUROC {rows[m]['roc_auc']:.2f}", flush=True)

    table = format_table(rows)
    print(table, flush=True)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "published": PUBLISHED,
                   "table_markdown": table}, f, indent=2)
    print(f"[runbook] wrote {args.out}", flush=True)

    gate = rows.get("df", {}).get("roc_auc")
    if gate is not None and gate < 99.5 and args.max_steps is None:
        print(f"[runbook] WARNING: DF AUROC {gate:.2f} is below the 99.5 "
              "north-star gate (BASELINE.md)", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
