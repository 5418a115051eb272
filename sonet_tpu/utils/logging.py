"""Metrics logging / observability.

Replaces the reference's visdom-based Visualizer (util/visualizer.py:8-105,
out-of-process HTTP server) with structured JSONL + CSV files and console
printing — greppable, dependency-free, and safe inside headless TPU jobs.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    """Console + JSONL + CSV metric sink.

    ``print_current_errors`` parity: prints epoch/iter/time like
    util/visualizer.py:79-84; history accumulates like plot_current_errors
    (visualizer.py:63-76) but lands in files instead of visdom.
    """

    def __init__(self, out_dir: Optional[str] = None, name: str = "train",
                 quiet: bool = False):
        self.quiet = quiet
        self.jsonl = None
        self.out_dir = out_dir
        self.name = name
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.jsonl = open(os.path.join(out_dir, f"{name}_metrics.jsonl"),
                              "a", buffering=1)
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], *, epoch=None,
            prefix: str = "") -> None:
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        if epoch is not None:
            rec["epoch"] = int(epoch)
        for k, v in metrics.items():
            try:
                rec[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        if not self.quiet:
            parts = [f"{k}: {v:.6g}" if isinstance(v, float) else f"{k}: {v}"
                     for k, v in rec.items()]
            print("  ".join(parts), flush=True)
        if self.jsonl:
            self.jsonl.write(json.dumps(rec) + "\n")
        if self.out_dir:
            # one CSV per metric family (prefix): train_ and test_ rows
            # have different key sets, so sharing a file would misalign
            # columns against the single header
            fam = prefix.rstrip("_") or "misc"
            path = os.path.join(self.out_dir,
                                f"{self.name}_{fam}_metrics.csv")
            exists = os.path.exists(path)
            with open(path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rec.keys()),
                                   extrasaction="ignore")
                if not exists:
                    w.writeheader()
                w.writerow(rec)

    def close(self):
        if self.jsonl:
            self.jsonl.close()


class StepTimer:
    """Wall-clock per-step timing with warmup skip; honest numbers need
    the caller to block_until_ready (SURVEY.md §5 'tracing')."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def mean(self) -> float:
        n = max(self.count - self.warmup, 1)
        return self.total / n
