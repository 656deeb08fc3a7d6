"""Structured metric logging: JSONL + CSV writers.

Replaces the reference's print-and-matplotlib observability
(/root/reference/utils.py:21-65, stdout prints, .npy dumps,
SURVEY.md §5) with an appendable metrics file per run; stdout printing is
kept for wall-clock parity with the reference's logs.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, also_print: bool = True):
        self.path = path
        self.also_print = also_print
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        row = {"step": step, "wall": round(time.time() - self._t0, 3), **metrics}
        if self.also_print:
            parts = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in row.items())
            print(parts, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(row) + "\n")

    def export_csv(self, csv_path: str):
        """Convert the JSONL log to CSV (column union over rows)."""
        if not self.path or not os.path.exists(self.path):
            return
        rows = [json.loads(l) for l in open(self.path)]
        cols = sorted({k for r in rows for k in r})
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            w.writerows(rows)
