"""Analyze inference stats pickles (labels + P(fake) per video/clip).

CLI replacement for the reference's statistics.ipynb post-analysis: per-
dataset AUROC/accuracy at an optimal threshold, score histograms (ASCII),
and the hardest errors.

  python tools/stats.py logs/<run>/stats_*_best_video.pickle
"""

from __future__ import annotations

import argparse
import pickle
import sys
from os import path

import numpy as np

sys.path.insert(0, path.join(path.dirname(path.dirname(path.abspath(__file__)))))

from dfd_clip_tpu.utils.metrics import roc_auc  # noqa: E402


def ascii_hist(values, bins=20, width=40, label=""):
    hist, edges = np.histogram(values, bins=bins, range=(0, 1))
    peak = hist.max() or 1
    lines = [label]
    for h, lo in zip(hist, edges[:-1]):
        bar = "#" * int(width * h / peak)
        lines.append(f"  {lo:4.2f} |{bar} {h}")
    return "\n".join(lines)


def analyze(stats_path: str):
    with open(stats_path, "rb") as f:
        stats = pickle.load(f)
    out = {}
    for dataset, data in stats.items():
        labels = np.asarray(data["label"])
        probs = np.asarray(data["prob"])
        calc = roc_auc()
        calc.add_batch(None, np.stack([1 - probs, probs], 1), labels)
        auc = calc.compute()["roc_auc"]

        # best-threshold accuracy sweep
        best_acc, best_thr = 0.0, 0.5
        for thr in np.linspace(0.05, 0.95, 19):
            acc = float(((probs >= thr).astype(int) == labels).mean())
            if acc > best_acc:
                best_acc, best_thr = acc, float(thr)

        errors = np.abs(probs - labels)
        worst = np.argsort(-errors)[:5]
        out[dataset] = {
            "n": len(labels),
            "auc": round(auc, 4),
            "acc@0.5": round(float(((probs >= 0.5).astype(int) == labels).mean()), 4),
            "best_acc": round(best_acc, 4),
            "best_thr": best_thr,
            "worst_indices": worst.tolist(),
        }
        print(f"== {dataset}: {out[dataset]}")
        print(ascii_hist(probs[labels == 0], label="  real-video P(fake):"))
        print(ascii_hist(probs[labels == 1], label="  fake-video P(fake):"))
    return out


def main():
    parser = argparse.ArgumentParser(description="Inference stats analysis")
    parser.add_argument("stats", nargs="+", help="stats_*.pickle files")
    args = parser.parse_args()
    for p in args.stats:
        print(f"--- {p}")
        analyze(p)


if __name__ == "__main__":
    main()
