"""Device-time profiling via jax.profiler traces.

``scan_bench`` (profiling.py) measures wall clock around a scanned loop;
on the remote axon backend that is dispatch-free but its loop-carried
perturbation inserts a full-array convert for bf16 inputs (~0.5 ms of
artifact at (8, 15000, 384)).  ``device_time`` instead parses the
profiler's device lane: it runs the jitted callable ``iters`` times
under ``jax.profiler.trace`` and returns the TPU-side execution time per
run plus a per-op breakdown — the honest numbers bench.py reports.
(The reference has no profiler at all; SURVEY.md §5.)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile
from typing import Callable, Dict, Tuple

import jax
import numpy as np


def _parse_trace(log_dir: str) -> Tuple[float, Dict[str, float]]:
    """Total device-lane ms and per-op ms from the newest trace.json.gz.

    Total = the XLA *module* spans (the per-run program execution time)
    when the trace carries them; the span-union over all device lanes is
    only the fallback.  Rationale (measured r4): the axon trace includes
    per-iteration DMA lanes whose spans extend past the compute span, so
    the union is erratically inflated (AE step: union 3.6-7.0 ms across
    repeats vs a rock-stable 2.14 ms module span) — phantom transfer
    time that is NOT on the program's critical path."""
    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise RuntimeError(f"no trace found under {log_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    names = {}
    threads = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items() if "TPU" in n or "GPU" in n}
    module_lanes = {k for k, n in threads.items()
                    if k[0] in dev_pids and "module" in n.lower()}
    per_op: Dict[str, float] = collections.defaultdict(float)
    spans = []
    module_ms = 0.0
    have_module_lane = bool(module_lanes)
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and e.get("dur") and e["pid"] in dev_pids):
            per_op[e["name"]] += e["dur"] / 1e3
            spans.append((e["ts"], e["ts"] + e["dur"]))
            is_module = ((e["pid"], e.get("tid")) in module_lanes
                         if have_module_lane
                         else e["name"].startswith("jit"))
            if is_module:
                module_ms += e["dur"] / 1e3
    if module_ms > 0.0:
        return module_ms, dict(per_op)
    # fallback: union of spans (avoids double counting nested events)
    total = 0.0
    for s, t in sorted(spans):
        if total == 0.0:
            cur_s, cur_t = s, t
            total = 1e-9
            continue
        if s > cur_t:
            total += cur_t - cur_s
            cur_s, cur_t = s, t
        else:
            cur_t = max(cur_t, t)
    if spans:
        total += cur_t - cur_s
    return total / 1e3, dict(per_op)


def device_time(fn: Callable, args, iters: int = 10,
                top: int = 0) -> Tuple[float, Dict[str, float]]:
    """Run jitted ``fn(*args)`` ``iters`` times under a profiler trace.

    Returns (device ms per run, {op name: ms per run}).  ``fn`` must be
    jit-compiled already (or cheap to trace); the first call outside the
    trace absorbs compilation.
    """
    def sync(out):
        # fetch the smallest float32 leaf: on axon only a real data fetch
        # synchronizes, and bf16/large-array fetches can fail through the
        # tunnel (scalar fetches are what bench.py relies on)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        f32 = [x for x in leaves if x.dtype == np.float32]
        leaf = min(f32 or leaves, key=lambda x: x.size)
        float(leaf.ravel()[0].astype(np.float32))

    out = fn(*args)
    sync(out)
    tmp = tempfile.mkdtemp(prefix="tprof_")
    tracing = False
    try:
        jax.profiler.start_trace(tmp)
        tracing = True
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        jax.profiler.stop_trace()
        tracing = False
        total, per_op = _parse_trace(tmp)
    finally:
        if tracing:  # failure mid-trace: don't leave the profiler armed
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        shutil.rmtree(tmp, ignore_errors=True)
    per_run = {k: v / iters for k, v in per_op.items()}
    if top:
        for name, ms in sorted(per_run.items(), key=lambda x: -x[1])[:top]:
            print(f"{ms:9.3f} ms  {name[:100]}")
    return total / iters, per_run
