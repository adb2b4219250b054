"""Evaluation: per-class Dice + nnU-Net-style summary.json.

The substrate writes ``validation/summary.json`` with per-class Dice after
training (SURVEY.md §5); this reproduces that surface so Dice parity against
the reference tables (BASELINE.md) is directly comparable.
"""

from __future__ import annotations

import json
import os

import numpy as np


def dice_scores(pred: np.ndarray, ref: np.ndarray, labels) -> dict[int, float]:
    """Hard Dice per label; NaN when the label is absent from both."""
    out = {}
    for l in labels:
        p = pred == l
        g = ref == l
        denom = p.sum() + g.sum()
        if denom == 0:
            out[int(l)] = float("nan")
        else:
            out[int(l)] = float(2.0 * np.logical_and(p, g).sum() / denom)
    return out


def evaluate_cases(
    cases: list[tuple[np.ndarray, np.ndarray, str]],
    labels,
    output_file: str | None = None,
) -> dict:
    """cases: list of (pred_seg, ref_seg, case_id)."""
    metric_per_case = []
    for pred, ref, cid in cases:
        metric_per_case.append(
            {"case": cid, "metrics": {str(k): v for k, v in dice_scores(pred, ref, labels).items()}}
        )
    mean = {}
    for l in labels:
        vals = [
            c["metrics"][str(l)]
            for c in metric_per_case
            if not np.isnan(c["metrics"][str(l)])
        ]
        mean[str(l)] = float(np.mean(vals)) if vals else float("nan")
    fg = [v for k, v in mean.items() if k != "0" and not np.isnan(v)]
    summary = {
        "metric_per_case": metric_per_case,
        "mean": mean,
        "foreground_mean": {"Dice": float(np.mean(fg)) if fg else float("nan")},
    }
    if output_file:
        os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
        with open(output_file, "w") as f:
            json.dump(summary, f, indent=2)
    return summary
