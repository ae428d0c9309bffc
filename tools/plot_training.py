#!/usr/bin/env python
"""Render training/validation loss curves from an experiment's train.log.

The trainer logs per-epoch train and validation CD sums (reference
train.py:188-246 format); this parses them back out and writes
``<exp_dir>/loss_curve.png`` plus a small JSON summary — the artifact
RESULTS.md embeds for real-protocol runs.
"""

from __future__ import annotations

import argparse
import json
import os
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

TRAIN_RE = re.compile(
    r"Training Epoch \[(\d+)/\d+\]: Coarse = ([\d.]+), Dense = ([\d.]+), "
    r"Total = ([\d.]+)"
)
VAL_RE = re.compile(
    r"Validate Epoch \[(\d+)/\d+\]: Coarse = ([\d.]+), Dense = ([\d.]+), "
    r"Total = ([\d.]+)"
)
BEST_RE = re.compile(r"Best l1 cd model in epoch (\d+), the minimum l1 cd is ([\d.]+)")


def parse_log(path: str):
    train, val, best = {}, {}, None
    with open(path) as f:
        for line in f:
            m = TRAIN_RE.search(line)
            if m:
                train[int(m.group(1))] = tuple(float(m.group(i)) for i in (2, 3, 4))
            m = VAL_RE.search(line)
            if m:
                val[int(m.group(1))] = tuple(float(m.group(i)) for i in (2, 3, 4))
            m = BEST_RE.search(line)
            if m:
                best = (int(m.group(1)), float(m.group(2)))
    return train, val, best


def find_log(exp_dir):
    """<exp_dir>/train.log, else the first *.log (main.py names the file
    after the command — overfit runs write overfit.log)."""
    path = os.path.join(exp_dir, "train.log")
    if os.path.exists(path):
        return path
    import glob

    candidates = sorted(glob.glob(os.path.join(exp_dir, "*.log")))
    return candidates[0] if candidates else path


def compare(exp_dirs, labels, out):
    """Overlay validation-total curves from several runs (e.g. f32 vs bf16
    at identical config/seed) on one log-scale plot."""
    fig, ax = plt.subplots(figsize=(7, 4))
    for d, lab in zip(exp_dirs, labels):
        _, val, _ = parse_log(find_log(d))
        ep = sorted(val)
        ax.plot(ep, [val[e][2] for e in ep], label=lab, linewidth=1.2)
    ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.set_ylabel("val total CD-L1 x 1e3")
    ax.set_title("validation loss")
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--compare", nargs="+", default=None, metavar="EXP_DIR",
                    help="overlay these runs' val curves with exp_dir's")
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.compare:
        dirs = [args.exp_dir] + args.compare
        labels = args.labels or [os.path.basename(os.path.normpath(d))
                                 for d in dirs]
        compare(dirs, labels, args.out or "val_compare.png")
        return
    train, val, best = parse_log(find_log(args.exp_dir))

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    for ax, series, title in ((axes[0], train, "train"), (axes[1], val, "validation")):
        ep = sorted(series)
        for idx, label in ((0, "coarse"), (1, "dense"), (2, "total")):
            ax.plot(ep, [series[e][idx] for e in ep], label=label, linewidth=1.2)
        ax.set_yscale("log")
        ax.set_xlabel("epoch")
        ax.set_ylabel("CD-L1 x 1e3")
        ax.set_title(f"{title} loss")
        ax.grid(True, alpha=0.3)
        ax.legend()
    if best:
        axes[1].axvline(best[0], color="gray", linestyle="--", alpha=0.6)
        axes[1].annotate(f"best @ {best[0]}: {best[1]:.1f}",
                         (best[0], best[1]), fontsize=8)
    fig.tight_layout()
    out = os.path.join(args.exp_dir, "loss_curve.png")
    fig.savefig(out, dpi=120)

    ep = sorted(val)
    summary = {
        "epochs": len(train),
        "final_train_total_1e3": train[max(train)][2] if train else None,
        "final_val_total_1e3": val[max(val)][2] if val else None,
        "best_val_epoch": best[0] if best else None,
        "best_val_total_1e3": best[1] if best else None,
        "val_first5_total": [val[e][2] for e in ep[:5]],
        "val_last5_total": [val[e][2] for e in ep[-5:]],
    }
    with open(os.path.join(args.exp_dir, "loss_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
