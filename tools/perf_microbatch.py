#!/usr/bin/env python3
"""Micro-batching serving benchmark: concurrent B=1 clients against
ServingEngine with coalescing off/on (docs/SERVING.md table).

    python tools/perf_microbatch.py --run <run_dir> [--clients 8]

Measured on the v5e tunnel (tiny-model run, 8 clients x 25 requests):
off 32 items/s p50 232 ms; 5 ms window 129 items/s p50 61 ms — 4x on
BOTH axes, because un-coalesced concurrent requests queue behind each
other's serialized dispatches.  Timing fetches real data per request
(CLAUDE.md: only fetches synchronize on this backend)."""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_case(run, window_ms, clients, reqs):
    from sonet_tpu.serving import ServingEngine

    eng = ServingEngine.from_run(run)
    eng.warmup()
    if window_ms:
        eng.start_microbatch(window_ms)
    x = {i["name"]: np.random.RandomState(0).randn(
            1, *i["shape"][1:]).astype(i["dtype"])
         for i in eng.manifest["inputs"]}
    np.asarray(eng.predict(x))  # settle (first poly/bucket compile)
    lat = [[] for _ in range(clients)]

    def client(ci):
        for _ in range(reqs):
            t0 = time.perf_counter()
            out = np.asarray(eng.predict(x))  # fetch = sync
            assert np.isfinite(out).all()
            lat[ci].append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=client, args=(c,)) for c in range(clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    flat = sorted(v for li in lat for v in li)
    s = eng.stats()
    if window_ms:
        eng.stop_microbatch()
    return {"items_per_s": round(clients * reqs / wall, 1),
            "p50_ms": round(flat[len(flat) // 2] * 1e3, 1),
            "p95_ms": round(flat[int(len(flat) * 0.95)] * 1e3, 1),
            "dispatches": s["dispatches"],
            "coalesced_requests": s["coalesced_requests"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="run directory (config.json + ckpt/)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=25,
                    help="requests per client (each B=1)")
    ap.add_argument("--windows_ms", default="0,5,15",
                    help="comma-separated coalescing windows (0 = off)")
    args = ap.parse_args()

    results = {}
    for w in (float(t) for t in args.windows_ms.split(",") if t.strip()):
        label = "off" if w == 0 else f"{w:g}ms"
        results[label] = run_case(args.run, w, args.clients, args.requests)
        print(label, json.dumps(results[label]), flush=True)
    print(json.dumps({"clients": args.clients, "requests": args.requests,
                      "results": results}))


if __name__ == "__main__":
    main()
