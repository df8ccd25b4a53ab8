"""Aggregate inference reports across runs.

CLI replacement for the reference's report.ipynb: collects
``report_*_<mode>_<modality>.json`` files under one or more run dirs and
prints a combined table (and optional CSV).

  python tools/report.py logs/cross-manipulation-raw/* --modality video
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from glob import glob
from os import path


def collect(run_dirs, weight_mode: str, modality: str):
    rows = []
    for run in run_dirs:
        pattern = path.join(run, f"report_*_{weight_mode}_{modality}.json")
        reports = sorted(glob(pattern))
        if not reports:
            print(f"warning: no reports in {run}", file=sys.stderr)
            continue
        with open(reports[-1]) as f:  # latest
            data = json.load(f)
        for dataset, metrics in data.items():
            rows.append({
                "run": path.basename(run.rstrip("/")),
                "dataset": dataset,
                **metrics,
            })
    return rows


def main():
    parser = argparse.ArgumentParser(description="Aggregate inference reports")
    parser.add_argument("runs", nargs="+", help="run directories")
    parser.add_argument("--weight_mode", default="best")
    parser.add_argument("--modality", default="video")
    parser.add_argument("--csv", default=None, help="write CSV to this path")
    args = parser.parse_args()

    rows = collect(args.runs, args.weight_mode, args.modality)
    if not rows:
        raise SystemExit("no reports found")

    cols = ["run", "dataset"] + sorted(
        {k for r in rows for k in r} - {"run", "dataset"}
    )
    widths = {c: max(len(c), *(len(str(r.get(c, ""))) for r in rows)) for c in cols}
    print("  ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        print("  ".join(str(r.get(c, "")).ljust(widths[c]) for c in cols))

    # mean per metric across runs (the cross-manipulation summary number)
    metric_cols = [c for c in cols if c not in ("run", "dataset")]
    means = {
        c: sum(float(r[c]) for r in rows if c in r) / max(1, sum(c in r for r in rows))
        for c in metric_cols
    }
    print("mean:", {k: round(v, 4) for k, v in means.items()})

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            w.writerows(rows)
    return rows


if __name__ == "__main__":
    main()
