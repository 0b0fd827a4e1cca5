#!/usr/bin/env python
"""Performance-curve plots (reference: performanceCurves.py).

The reference hardcodes LLaVA-Next CIDEr/VQAv2 sweeps over weight bits x
activation bits x {awq, sq, naive} and renders matplotlib line plots
(performanceCurves.py:22-79).  This version reads sweep results from a
JSON file (schema below) and falls back to the reference's published
numbers (BASELINE.md rows) so the exact reference figures reproduce.

JSON schema:
  {"metric": "CIDEr", "x_label": "weight bits", "x": [2,3,4,6,8,16],
   "series": {"AWQ fp16-act": [..], ...}}
"""

import argparse
import json
import sys

# Reference-published sweep data (BASELINE.md / performanceCurves.py:22-61)
REFERENCE_SWEEPS = [
    {
        "metric": "CIDEr (LLaVA-Next)",
        "x_label": "weight bits",
        "x": [2, 3, 4, 6, 8, 16],
        "series": {
            "AWQ fp16-act": [0, 1.0696, 1.1598, 1.1813, 1.1759, 1.1709],
            "AWQ int8-act": [None, 1.0907, 1.1532, 1.1721, 1.1755, 1.1755],
            "AWQ int4-act": [None, 0.0444, 0.0328, 0.0645, 0.0666, 0.0666],
            "naive int8-act": [None, None, 1.1152, 1.1825, 1.1534, None],
        },
    },
    {
        "metric": "VQAv2 (LLaVA-Next)",
        "x_label": "weight bits",
        "x": [2, 3, 4, 6, 8, 16],
        "series": {
            "AWQ fp16-act": [0, 0.7526, 0.762, 0.7658, 0.7652, 0.764],
            "AWQ int8-act": [None, 0.7502, 0.7652, 0.7654, 0.7666, 0.7666],
            "AWQ int4-act": [None, 0.1042, 0.209, 0.3244, 0.3333, 0.3333],
            "naive int8-act": [None, None, 0.7630, 0.755, 0.768, None],
        },
    },
]


def plot(sweeps, out_prefix="perf_curve"):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib unavailable; printing tables instead")
        for s in sweeps:
            print(f"\n== {s['metric']} ==")
            print(s["x_label"], s["x"])
            for name, ys in s["series"].items():
                print(f"  {name}: {ys}")
        return
    for i, s in enumerate(sweeps):
        fig, ax = plt.subplots(figsize=(6, 4))
        for name, ys in s["series"].items():
            xs = [x for x, y in zip(s["x"], ys) if y is not None]
            vals = [y for y in ys if y is not None]
            ax.plot(xs, vals, marker="o", label=name)
        ax.set_xlabel(s["x_label"])
        ax.set_ylabel(s["metric"])
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
        fig.tight_layout()
        path = f"{out_prefix}_{i}.png"
        fig.savefig(path, dpi=120)
        print("wrote", path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", help="sweep-results JSON (list of sweeps)")
    ap.add_argument("--out", default="perf_curve")
    args = ap.parse_args()
    if args.results:
        with open(args.results) as f:
            sweeps = json.load(f)
    else:
        sweeps = REFERENCE_SWEEPS
    plot(sweeps, args.out)
