#!/usr/bin/env python3
"""Measure the chunked device pipeline vs the resident one on the real
chip (VERDICT r2 #2 'done' gate: chunked >= 80% of resident throughput
when the budget is forced below the split size).

Synthesizes a ModelNet-shaped split (T x 10,000 x 6 raw points + SOM
nodes), runs full flagship train epochs (B=8, N=5000, bf16) through

  (a) the resident pipeline: whole split in HBM, one epoch-scan, and
  (b) the chunked pipeline: --device_budget_gb forces multiple
      double-buffered super-chunks, one epoch-scan per chunk,

and reports clouds/s for both.  Timing fetches metrics (dispatch-only
timing lies on the tunneled backend, CLAUDE.md).

    python tools/perf_chunked.py --items 1024 --budget_gb 0.12 --epochs 3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1024)
    ap.add_argument("--budget_gb", type=float, default=0.12)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--preset", default="modelnet40")
    ap.add_argument("--raw_n", type=int, default=10000,
                    help="raw points per stored item (ModelNet: 10k)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (host->device is a "
                         "local copy — models a co-located TPU host "
                         "whose DMA bandwidth >> tunnel bandwidth)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from sonet_tpu import config as cfg_mod, train
    from sonet_tpu.data.device_pipeline import (ChunkedDeviceData,
                                                device_data_from_host,
                                                make_device_epoch_fns,
                                                split_nbytes)
    from sonet_tpu.models import build_model

    cfg = getattr(cfg_mod, args.preset)()
    T, B = args.items, cfg.batch_size
    rs = np.random.RandomState(0)
    host = {
        "pc": rs.randn(T, args.raw_n, 3).astype(np.float32),
        "sn": rs.randn(T, args.raw_n, 3).astype(np.float32),
        "node": rs.randn(T, cfg.node_num, 3).astype(np.float32),
        "label": rs.randint(0, cfg.classes, T).astype(np.int64),
    }
    nbytes = split_nbytes(host)
    steps_per_epoch = T // B
    print(f"split: {T} items, {nbytes / 1e9:.3f} GB; budget "
          f"{args.budget_gb} GB; {steps_per_epoch} steps/epoch")

    model = build_model(cfg)
    ex = (jnp.zeros((B, cfg.input_pc_num, 3), jnp.float32),
          jnp.zeros((B, cfg.input_pc_num, 3), jnp.float32),
          jnp.zeros((B, cfg.node_num, 3), jnp.float32))
    state0 = train.init_state(model, cfg, jax.random.PRNGKey(0), ex,
                              steps_per_epoch=steps_per_epoch)
    tfn, _ = make_device_epoch_fns(model, cfg, steps_per_epoch)
    rng = jax.random.PRNGKey(1)

    def fresh_state():
        # the epoch fn donates its state arg; each run needs its own copy
        return jax.tree_util.tree_map(jnp.copy, state0)

    def run_resident():
        data = device_data_from_host(host)
        state = fresh_state()
        times = []
        for ep in range(args.epochs + 1):  # epoch 0 = compile warmup
            order = np.random.default_rng(1000 + ep).permutation(T)
            table = jnp.asarray(
                order[: steps_per_epoch * B].reshape(-1, B).astype(np.int32))
            t0 = time.perf_counter()
            state, ms = tfn(state, data, table, rng)
            float(ms["loss"][-1])  # fetch = sync
            times.append(time.perf_counter() - t0)
        del data
        return times[1:]

    def run_chunked():
        cd = ChunkedDeviceData(host, int(args.budget_gb * 1e9), B, seed=0)
        print(f"chunked: {cd.num_chunks} chunks of {cd.chunk_items} items")
        state = fresh_state()
        times = []
        for ep in range(args.epochs + 1):
            t0 = time.perf_counter()
            last = None
            for dd, table, _v in cd.epoch_chunks(True, ep, B, True):
                state, ms = tfn(state, dd, table, rng)
                last = ms
            float(last["loss"][-1])
            times.append(time.perf_counter() - t0)
        return times[1:]

    res = run_resident()
    chk = run_chunked()
    cps_res = steps_per_epoch * B / np.median(res)
    cps_chk = steps_per_epoch * B / np.median(chk)
    print(f"resident: {[f'{t:.2f}' for t in res]} s/epoch "
          f"-> {cps_res:.0f} clouds/s")
    print(f"chunked:  {[f'{t:.2f}' for t in chk]} s/epoch "
          f"-> {cps_chk:.0f} clouds/s")
    print(f"chunked/resident = {cps_chk / cps_res:.3f} "
          f"(gate: >= 0.80)")


if __name__ == "__main__":
    main()
