#!/usr/bin/env python3
"""Multi-task perf regression harness (VERDICT r3 prescription #1).

Measures the FULL compiled training step of all three task families
plus batched inference, each at its reference configuration
(modelnet/options.py:21-40, part-seg/options.py, autoencoder/options.py
— bfloat16 activations, f32 params/BN stats), and adjudicates every
number against a committed budget:

* classify      — ModelNet40 train step, B=8, N=5000, 8x8 SOM
* segment       — ShapeNetPart train step, B=8, N=1024
* autoencode    — ShapeNet AE train step, B=8, N=1024
* classify_infer_b64 — ModelNet40 eval forward, B=64

Honest-number policy (VERDICT r1 weak #1/#2, r3 weak #1-#3):
* device ms/step = MIN over ``--repeats`` independent profiler
  traces (the jax.profiler device lane, sonet_tpu.utils.tprof), with
  the median and the full spread recorded — tunnel contamination is
  strictly additive, so the floor is the hardware number; a single-run
  number inside the tunnel's noise band cannot adjudicate a 5%
  regression, the floor can (see BUDGETS_MS).
* wall ms/step from synced fetches as a fallback gate only
  (jax.block_until_ready returns early on the axon backend; only data
  fetches synchronize).
* per-op attribution via HLO-joined categories
  (sonet_tpu.utils.hlocat) — GEMMs / BN stats / Adam / sorts / pooling
  kernel / copies — replacing the old substring buckets that
  under-attributed MXU work ~13x.
* the headline metric stays the classify epoch-scan throughput
  (clouds/s) so BENCH_r* files stay comparable across rounds;
  vs_baseline = throughput / 250 clouds/s (the conservative 1x-GPU
  estimate BASELINE.json's 5x target is built on — the PyTorch
  reference publishes NO throughput, BASELINE.md).

Regression policy: each task is gated on its device-lane FLOOR when
the profiler delivered at least one trace, else on its wall median
(the trace occasionally hangs on the tunneled backend — CLAUDE.md);
classify additionally gates its epoch-scan floor (the production
dispatch-free number, which catches host/graph regressions the device
floor cannot).  Any blown budget sets ``"regression": true`` in the
JSON line and exits nonzero.

Prints ONE COMPACT JSON line as the LAST stdout line ({"metric",
"value", "unit", "vs_baseline", "device_floors_ms", "regression"}) —
small enough that the driver's tail capture can never truncate it
(BENCH_r04 lost its machine-readable headline to exactly that) — and
writes the full per-task detail (spreads, categories, budgets, MFU) to
``bench_detail.json`` next to this file.
"""

import argparse
import gc
import json
import signal
import statistics
import sys
import time

import numpy as np

REF_CLOUDS_PER_SEC = 250.0  # estimated PyTorch-GPU reference (see docstring)
V5E_PEAK_BF16_FLOPS = 197e12

# Committed per-task budgets (ms/step), gated on the MIN device-lane
# time over the repeats: tunnel contamination is strictly additive
# (the r4 calibration run measured classify traces of [3.705, 3.705,
# 5.35, 5.27, 4.41] in one bad stretch — the floor is the hardware
# number, and a real regression raises the floor), so min-gating
# adjudicates a 5% regression that a median inside the weather band
# cannot.  Device budgets = r4 calibration floor + ~5-8% headroom.
# Wall budgets are the fallback gate only (per-step dispatch adds
# ~1-2 ms and the tunnel's ±8%+ run-to-run noise, so they carry much
# more slack and only gate when every trace failed).
BUDGETS_MS = {
    # floors measured r5 after the ragged/lane-packed pooling-kernel
    # rework (module-span lane, all 3 traces within 1 us): classify
    # 3.508, segment 4.550, autoencode 2.104, infer-B64 13.636
    # (r4 floors were 3.699 / 4.595 / 2.143 / 17.053)
    "classify":           {"device": 3.72, "wall": 6.8, "scan": 4.1},
    "segment":            {"device": 4.80, "wall": 7.2},
    "autoencode":         {"device": 2.25, "wall": 6.6},
    "classify_infer_b64": {"device": 14.5, "wall": 18.5},
}


class _Alarm:
    """SIGALRM guard: the profiler trace occasionally hangs on the
    tunneled backend (CLAUDE.md) — bound every attempt."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        def bail(signum, frame):
            raise TimeoutError("profiler trace hung")
        signal.signal(signal.SIGALRM, bail)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        signal.alarm(0)
        return False


def _sync(out):
    """Force completion: fetch the smallest f32 leaf (axon only
    synchronizes on real data fetches)."""
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    f32 = [x for x in leaves if x.dtype == np.float32]
    leaf = min(f32 or leaves, key=lambda x: x.size)
    float(leaf.ravel()[0].astype(np.float32))


def _make_batch(cfg, rs, with_seg=False):
    import jax.numpy as jnp
    B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
    batch = {
        "pc": jnp.asarray(rs.randn(B, N, 3).astype(np.float32)),
        "sn": jnp.asarray(rs.randn(B, N, 3).astype(np.float32)),
        "node": jnp.asarray(rs.randn(B, M, 3).astype(np.float32)),
    }
    if with_seg:
        batch["label"] = jnp.asarray(rs.randint(0, 16, B))
        batch["seg"] = jnp.asarray(rs.randint(0, cfg.classes, (B, N)))
    else:
        batch["label"] = jnp.asarray(rs.randint(0, cfg.classes, B))
    return batch


def _build_task(name):
    """-> (f, state, batch, cfg, raw_step) with f = jit(lambda s: step)
    non-donating so one state serves every repeat."""
    import jax
    from sonet_tpu import config as cfg_mod, train
    from sonet_tpu.models import build_model

    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(1)
    if name == "classify":
        cfg = cfg_mod.modelnet40()
    elif name == "segment":
        cfg = cfg_mod.shapenetpart()
    elif name == "autoencode":
        cfg = cfg_mod.autoencoder()
    elif name == "classify_infer_b64":
        cfg = cfg_mod.modelnet40().replace(batch_size=64)
    else:
        raise ValueError(name)
    model = build_model(cfg)
    batch = _make_batch(cfg, rs, with_seg=(name == "segment"))
    extra = (batch["label"],) if name == "segment" else ()
    state = train.init_state(model, cfg, jax.random.PRNGKey(0),
                             (batch["pc"], batch["sn"], batch["node"],
                              *extra),
                             steps_per_epoch=1230)
    train_step, eval_step = train.make_steps(model, cfg, 1230)
    if name == "classify_infer_b64":
        raw = eval_step.__wrapped__
        f = jax.jit(lambda s: raw(s, batch))
    else:
        raw = train_step.__wrapped__
        f = jax.jit(lambda s: raw(s, batch, rng))
    return f, state, batch, cfg, raw


def _measure_task(name, repeats, iters, trace_timeout):
    """One task: compile, wall medians, device-lane medians + HLO
    categories.  Returns the per-task result dict (plus internals for
    the classify headline)."""
    import jax
    from sonet_tpu.utils.hlocat import categorize, parse_hlo_fusions
    from sonet_tpu.utils.tprof import device_time

    print(f"bench: {name}: compiling ...", file=sys.stderr, flush=True)
    f, state, batch, cfg, raw = _build_task(name)
    compiled = f.lower(state).compile()
    flops = None
    try:
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception:
        pass

    # warmup + wall medians (fetch-synced; step has no data dependence
    # chain across calls since f does not donate — each call reads the
    # same state, so the final fetch bounds the whole burst)
    out = compiled(state)
    _sync(out)
    wall_runs = []
    for _ in range(3):
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            out = compiled(state)
        _sync(out)
        wall_runs.append((time.perf_counter() - t0) / n * 1e3)
    wall_med = statistics.median(wall_runs)

    # device-lane: `repeats` independent traces of the SAME AOT
    # executable (a fresh jit call would recompile the identical
    # program — lower().compile() does not populate the jit cache)
    dev_runs, per_ops = [], []
    attempts = 0
    while len(dev_runs) < repeats and attempts < repeats + 3:
        attempts += 1
        try:
            with _Alarm(trace_timeout):
                dev_ms, per_op = device_time(compiled, (state,),
                                             iters=iters)
            dev_runs.append(dev_ms)
            per_ops.append(per_op)
            print(f"bench: {name}: trace {len(dev_runs)}/{repeats}: "
                  f"{dev_ms:.3f} ms", file=sys.stderr, flush=True)
        except Exception as e:
            print(f"bench: {name}: trace failed ({e})", file=sys.stderr,
                  flush=True)
            continue
    # Budget-miss retry: tunnel noise is strictly ADDITIVE (CLAUDE.md),
    # so a floor above the device budget is either weather (another
    # trace will eventually come back clean — the r4 calibration saw
    # AE floors of 3.59 ms in one stretch and 2.14 ms an hour later)
    # or a real regression (no number of retries lowers the floor).
    # Retrying converts weather into a few extra minutes instead of a
    # false "regression": true in the round artifact.
    dev_budget = BUDGETS_MS[name].get("device")
    retries = 0
    while (dev_runs and dev_budget is not None
           and min(dev_runs) > dev_budget and retries < 6):
        retries += 1
        time.sleep(15)  # bad stretches last minutes; spread the probes
        try:
            with _Alarm(trace_timeout):
                dev_ms, per_op = device_time(compiled, (state,),
                                             iters=iters)
            dev_runs.append(dev_ms)
            per_ops.append(per_op)
            print(f"bench: {name}: budget-miss retry {retries}: "
                  f"{dev_ms:.3f} ms", file=sys.stderr, flush=True)
        except Exception as e:
            print(f"bench: {name}: retry trace failed ({e})",
                  file=sys.stderr, flush=True)

    dev_min = min(dev_runs) if dev_runs else None
    dev_med = statistics.median(dev_runs) if dev_runs else None

    # categories from the CLEANEST trace (the min): contaminated
    # traces would smear phantom milliseconds over the attribution
    categories = {}
    if per_ops:
        best = per_ops[dev_runs.index(dev_min)]
        try:
            fusions = parse_hlo_fusions(compiled.as_text())
            categories = categorize(best, fusions)
        except Exception:
            categories = {}

    budget = BUDGETS_MS[name]
    gate = "device" if dev_min is not None else "wall"
    gated_ms = dev_min if dev_min is not None else wall_med
    ok = gated_ms <= budget[gate]
    res = {
        "wall_ms": round(wall_med, 3),
        "wall_ms_all": [round(x, 3) for x in wall_runs],
        "device_ms": round(dev_min, 3) if dev_min is not None else None,
        "device_ms_median": (round(dev_med, 3) if dev_med is not None
                             else None),
        "device_ms_all": [round(x, 3) for x in dev_runs],
        "budget_ms": budget,
        "gate": gate,
        "ok": bool(ok),
    }
    if categories:
        res["categories_ms"] = categories
    if flops is not None:
        res["flops_per_step"] = flops
        if dev_min:
            res["mfu_device"] = round(
                flops / (dev_min / 1e3) / V5E_PEAK_BF16_FLOPS, 4)
    return res, (f, state, batch, cfg, raw, flops)


def _classify_headline(internals):
    """Epoch-scan throughput — the production trainer scans whole
    epochs inside one jit (data/device_pipeline.py), so per-step
    dispatch vanishes; this is the sustained number real training
    achieves.  Median of 3 timed scans."""
    import jax
    import jax.numpy as jnp
    f, state, batch, cfg, raw, flops = internals
    rng = jax.random.PRNGKey(1)

    def epoch100(state):
        def body(s, i):
            s, m = raw(s, batch, jax.random.fold_in(rng, i))
            return s, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(100))

    f100 = jax.jit(epoch100)
    state2, losses = f100(state)
    _ = float(losses[-1])

    def one_run():
        t0 = time.perf_counter()
        _s, ls = f100(state)
        _ = float(ls[-1])
        return (time.perf_counter() - t0) / 100 * 1e3

    runs = [one_run() for _ in range(3)]
    # same additive-noise retry as the device gate: the scan floor is
    # gated against BUDGETS_MS['classify']['scan'], and a bad tunnel
    # stretch can inflate all three runs; more probes find the floor
    scan_budget = BUDGETS_MS["classify"].get("scan")
    retries = 0
    while (scan_budget and min(runs) > scan_budget and retries < 6):
        retries += 1
        time.sleep(15)
        runs.append(one_run())
        print(f"bench: classify: scan budget-miss retry {retries}: "
              f"{runs[-1]:.3f} ms", file=sys.stderr, flush=True)
    return statistics.median(runs), runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5,
                    help="independent profiler traces per task")
    ap.add_argument("--iters", type=int, default=10,
                    help="steps inside each trace")
    ap.add_argument("--tasks", nargs="*", default=list(BUDGETS_MS),
                    choices=list(BUDGETS_MS))
    ap.add_argument("--trace_timeout", type=int, default=120)
    args = ap.parse_args()

    tasks = {}
    classify_internals = None
    for name in args.tasks:
        res, internals = _measure_task(name, args.repeats, args.iters,
                                       args.trace_timeout)
        tasks[name] = res
        if name == "classify":
            classify_internals = internals
        else:
            del internals
            gc.collect()

    out = {
        "metric": "ModelNet40 train throughput (B=8, N=5000, bf16 full "
                  "step, epoch-scan)",
        "unit": "point clouds/sec/chip",
    }
    scan_ms = None
    if classify_internals is not None:
        print("bench: classify: epoch-scan headline ...", file=sys.stderr,
              flush=True)
        scan_ms, scan_runs = _classify_headline(classify_internals)
        B = classify_internals[3].batch_size
        flops = classify_internals[5]
        clouds = B / (scan_ms / 1e3)
        out["value"] = round(clouds, 2)
        out["vs_baseline"] = round(clouds / REF_CLOUDS_PER_SEC, 3)
        out["step_ms_scanned"] = round(scan_ms, 3)
        out["scan_ms_all"] = [round(x, 3) for x in scan_runs]
        out["step_ms_wall"] = tasks["classify"]["wall_ms"]
        if tasks["classify"].get("device_ms") is not None:
            out["step_ms_device"] = tasks["classify"]["device_ms"]
        if flops is not None:
            out["flops_per_step"] = flops
            out["mfu"] = round(flops / (scan_ms / 1e3)
                               / V5E_PEAK_BF16_FLOPS, 4)
        # the scanned number also gates: it is the production per-step
        # time (dispatch-free) and catches host/graph regressions the
        # device floor cannot (min over runs, same additive-noise logic)
        scan_budget = BUDGETS_MS["classify"].get("scan")
        if scan_budget and min(scan_runs) > scan_budget:
            tasks["classify"]["ok"] = False
            tasks["classify"]["scan_over_budget"] = True
    regressions = [n for n, r in tasks.items() if not r["ok"]]
    out["tasks"] = tasks
    out["regression"] = bool(regressions)
    if regressions:
        out["regressions"] = regressions

    # Full per-task detail goes to a sibling file; stdout's LAST line is
    # a COMPACT summary the driver's tail window can never truncate
    # (BENCH_r04 recorded "parsed": null because the ~4 KB detail line
    # was cut mid-stream — VERDICT r4 weak #3).
    import os
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_detail.json")
    with open(detail_path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    compact = {k: out[k] for k in ("metric", "value", "unit",
                                   "vs_baseline", "step_ms_scanned",
                                   "mfu") if k in out}
    compact["device_floors_ms"] = {
        n: r.get("device_ms") for n, r in tasks.items()}
    compact["regression"] = bool(regressions)
    if regressions:
        compact["regressions"] = regressions
    compact["detail"] = "bench_detail.json"
    print(json.dumps(compact))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
