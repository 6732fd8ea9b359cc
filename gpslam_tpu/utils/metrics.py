"""Structured metrics output (SURVEY.md §5.5): per-solve / per-iteration
records to JSONL or CSV — the replacement for GTSAM's verbosity prints.
"""

from __future__ import annotations

import csv
import json
from typing import Optional

import numpy as np


def solve_record(stats, extra: Optional[dict] = None) -> dict:
    """Flatten a SolveStats into a JSON-serializable record."""
    hist_e = np.asarray(stats.error_history)
    valid = np.isfinite(hist_e)
    rec = {
        "chi2_init": float(stats.error0),
        "chi2_final": float(stats.error),
        "iterations": int(stats.iterations),
        "converged": bool(stats.converged),
        "aborted": bool(stats.aborted),
        "lambda_final": float(stats.lambda_final),
        "error_history": [float(x) for x in hist_e[valid]],
        "lambda_history": [
            float(x) for x in np.asarray(stats.lambda_history)[valid]
        ],
        "accepted": [bool(x) for x in np.asarray(stats.accept_history)[valid]],
    }
    if extra:
        rec.update(extra)
    return rec


def write_jsonl(path: str, records) -> None:
    with open(path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def write_iteration_csv(path: str, stats) -> None:
    """Per-iteration CSV: iter, chi2, lambda, accepted."""
    hist_e = np.asarray(stats.error_history)
    valid = np.isfinite(hist_e)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["iteration", "chi2", "lambda", "accepted"])
        lam = np.asarray(stats.lambda_history)
        acc = np.asarray(stats.accept_history)
        for i in np.nonzero(valid)[0]:
            w.writerow([int(i), float(hist_e[i]), float(lam[i]), bool(acc[i])])
