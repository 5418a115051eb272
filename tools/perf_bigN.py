#!/usr/bin/env python3
"""Large-N envelope: how big a cloud can one chip train on, and at
what ms/step (VERDICT r3 #4).

The point axis is this rebuild's long-context analogue (SURVEY.md §5):
the reference materializes a B x C x N x M tensor in its SOM kNN
(util/som.py:245-250) and a B x C x kN grouped stack, which caps N on
a single GPU; the sorted pipeline + windowed Pallas pooling here keep
the working set O(B kN C) with no N x M blowup, and ``--remat``
rematerializes the per-point stacks in the backward pass to push N
further at the cost of recompute.

Walks ``input_pc_num`` upward at the flagship ModelNet40 configuration
(full widths, bf16, two Adam groups) until compile/alloc fails, and
records ms/step (fetch-synced wall over ``--iters`` steps) for each
point.  Each point runs in its OWN subprocess: the axon tunnel has
hang stretches where even a 30 s compile stalls forever and only
killing the process recovers (CLAUDE.md), so a hung point is killed
and retried with a fresh process/tunnel connection; a TIMEOUT after
retries does not end the N series — only a real alloc failure (OOM)
does.  Run on the real chip:

    PYTHONPATH=/root/.axon_site:. python tools/perf_bigN.py \
        [--batch 8] [--remat 0 1] [--ns 5000 10000 ...] [--iters 10]

Prints a markdown table for docs/DESIGN.md.
"""

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DEFAULT_NS = [5000, 10000, 20000, 40000, 80000, 120000, 160000, 240000,
              320000]


def measure(B, N, remat, iters):
    """-> (wall ms/step, compile s) or raises."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sonet_tpu import config as cfg_mod, train
    from sonet_tpu.models import build_model

    cfg = cfg_mod.modelnet40().replace(batch_size=B, input_pc_num=N,
                                       remat=bool(remat))
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    M = cfg.node_num
    batch = {
        "pc": jnp.asarray(rs.randn(B, N, 3).astype(np.float32)),
        "sn": jnp.asarray(rs.randn(B, N, 3).astype(np.float32)),
        "node": jnp.asarray(rs.randn(B, M, 3).astype(np.float32)),
        "label": jnp.asarray(rs.randint(0, cfg.classes, B)),
    }
    state = train.init_state(model, cfg, jax.random.PRNGKey(0),
                             (batch["pc"], batch["sn"], batch["node"]),
                             steps_per_epoch=1230)
    train_step, _ = train.make_steps(model, cfg, 1230)
    raw = train_step.__wrapped__
    rng = jax.random.PRNGKey(1)
    f = jax.jit(lambda s: raw(s, batch, rng))
    t0 = time.perf_counter()
    compiled = f.lower(state).compile()
    compile_s = time.perf_counter() - t0
    out = compiled(state)
    float(out[1]["loss"])  # sync (axon: only fetches synchronize)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(state)
    float(out[1]["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, compile_s


def run_point(B, N, remat, iters):
    """One measurement in this process; prints a JSON line."""
    try:
        ms, cs = measure(B, N, remat, iters)
        print(json.dumps({"ok": True, "ms": ms, "compile_s": cs}),
              flush=True)
    except Exception as e:  # noqa: BLE001 — reported to the driver
        oom = ("RESOURCE_EXHAUSTED" in str(e)
               or "memory" in str(e).lower())
        traceback.print_exc(limit=2, file=sys.stderr)
        print(json.dumps({"ok": False, "oom": oom,
                          "err": type(e).__name__}), flush=True)


def drive_point(B, N, remat, iters, timeout, retries=3):
    """Subprocess-per-attempt driver -> dict from run_point, or
    {"ok": False, "err": "TIMEOUT"} when every attempt hung."""
    cmd = [sys.executable, os.path.abspath(__file__), "--point",
           str(B), str(remat), str(N), "--iters", str(iters)]
    for attempt in range(retries):
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"(B={B} remat={remat} N={N}: attempt {attempt} hung "
                  f"{timeout}s; killed, retrying w/ fresh process)",
                  file=sys.stderr, flush=True)
            continue
        for line in r.stdout.splitlines()[::-1]:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        sys.stderr.write(r.stderr[-2000:])
        return {"ok": False, "err": f"rc={r.returncode}, no JSON"}
    return {"ok": False, "err": "TIMEOUT"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="*", default=[8, 1])
    ap.add_argument("--remat", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--ns", type=int, nargs="*", default=DEFAULT_NS)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--timeout", type=int, default=900,
                    help="seconds per (B, remat, N) attempt")
    ap.add_argument("--point", nargs=3, type=int, metavar=("B", "REMAT",
                    "N"), help="internal: measure one point and print "
                    "a JSON line (used by the subprocess driver)")
    args = ap.parse_args()

    if args.point:
        B, remat, N = args.point
        run_point(B, N, remat, args.iters)
        return

    rows = []
    print("| B | remat | N | ms/step | kpts/s | compile s |")
    print("|---|---|---|---|---|---|")
    for B in args.batch:
        for remat in args.remat:
            for N in args.ns:
                res = drive_point(B, N, remat, args.iters, args.timeout)
                if res.get("ok"):
                    ms, cs = res["ms"], res["compile_s"]
                    kpts = B * N / ms  # points/ms == kpts/s
                    print(f"| {B} | {remat} | {N} | {ms:.2f} | "
                          f"{kpts:.0f} | {cs:.0f} |", flush=True)
                    rows.append((B, remat, N, ms))
                elif res.get("oom"):
                    print(f"| {B} | {remat} | {N} | OOM | | |",
                          flush=True)
                    rows.append((B, remat, N, None))
                    break  # larger N will not fit either
                else:
                    print(f"| {B} | {remat} | {N} | {res['err']} | | |",
                          flush=True)
                    rows.append((B, remat, N, None))
    # envelope summary
    for B in args.batch:
        for remat in args.remat:
            fit = [r for r in rows if r[0] == B and r[1] == remat
                   and r[3] is not None]
            if fit:
                b, r, n, ms = max(fit, key=lambda r: r[2])
                print(f"max N at B={b} remat={r}: {n} ({ms:.2f} ms/step)")


if __name__ == "__main__":
    main()
