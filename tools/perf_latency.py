#!/usr/bin/env python3
"""Serving latency: classify eval-step latency across batch sizes.

Two numbers per batch size:
* device ms/step — scanned inside one program (scan_bench style), the
  latency a warm co-located server sees;
* dispatch ms/step — one python dispatch + fetch per request, which on
  a remote/tunneled host adds the round-trip (the reason SERVING.md
  says to batch requests and keep the step warm).

Usage: PYTHONPATH=... python tools/perf_latency.py [--batches 1,8,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sonet_tpu import config as cfg_mod, models, train
    from sonet_tpu.utils.profiling import scan_bench

    print(f"devices: {jax.devices()}")
    for B in [int(b) for b in args.batches.split(",")]:
        cfg = cfg_mod.modelnet40().replace(batch_size=B)
        model = models.build_model(cfg)
        rs = np.random.RandomState(0)
        batch = {
            "pc": jnp.asarray(rs.randn(B, cfg.input_pc_num, 3), jnp.float32),
            "sn": jnp.asarray(rs.randn(B, cfg.input_pc_num, 3), jnp.float32),
            "node": jnp.asarray(rs.randn(B, cfg.node_num, 3), jnp.float32),
            "label": jnp.zeros((B,), jnp.int32),
        }
        state = train.init_state(model, cfg, jax.random.PRNGKey(0),
                                 (batch["pc"], batch["sn"], batch["node"]))
        _, eval_step = train.make_steps(model, cfg, 1)

        # device-lane latency: scan the step inside one program
        def step_fn(pc, sn, node, label):
            m = eval_step(state, {"pc": pc, "sn": sn, "node": node,
                                  "label": label})
            return m["score"]

        dev_ms = scan_bench(step_fn, (batch["pc"], batch["sn"],
                                      batch["node"], batch["label"]),
                            iters=args.iters) * 1e3

        # per-dispatch latency: python call + fetch each time
        _ = np.asarray(eval_step(state, batch)["score"])  # compile
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            _ = np.asarray(eval_step(state, batch)["score"])
            times.append((time.perf_counter() - t0) * 1e3)
        times.sort()
        p50, p95 = times[len(times) // 2], times[int(len(times) * 0.95)]
        print(f"B={B:3d}: device {dev_ms:7.3f} ms/step "
              f"({B / dev_ms * 1e3:7.0f} clouds/s)   "
              f"dispatch p50 {p50:7.2f} ms  p95 {p95:7.2f} ms")


if __name__ == "__main__":
    main()
