#!/usr/bin/env python3
"""Benchmark: ModelNet40 training throughput (point clouds / sec / chip).

Measures the FULL compiled training step (forward + backward + two Adam
groups + BN stats) at the reference configuration: batch 8, 5000 points,
8x8 SOM, k=3, som_k=9, feature 1024 (modelnet/options.py:21-40).

Baseline: the PyTorch reference publishes no throughput (BASELINE.md).
The 1x-GPU reference at this config runs ~32 ms/iter on a GTX 1080 Ti
(in-repo evidence: none; conservative estimate used by BASELINE.json's
5x north-star target) => ~250 clouds/s.  vs_baseline is measured
throughput / 250.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_CLOUDS_PER_SEC = 250.0  # estimated PyTorch-GPU reference (see docstring)


def main():
    import jax
    import jax.numpy as jnp
    from sonet_tpu import config as cfg_mod, train
    from sonet_tpu.models import build_model

    # production config: bf16 compute (f32 params/BN stats); the f32
    # parity config benches ~12% slower
    cfg = cfg_mod.modelnet40().replace(compute_dtype="bfloat16")
    model = build_model(cfg)

    rs = np.random.RandomState(0)
    B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
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
    rng = jax.random.PRNGKey(1)

    # compile + warmup.  NB: on the axon remote backend
    # jax.block_until_ready returns before execution completes — only a
    # real data fetch synchronizes, so timing uses float() fetches.
    for _ in range(3):
        state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])  # hard sync: step i depends on state i-1
    dt = (time.perf_counter() - t0) / iters

    clouds_per_sec = B / dt
    print(json.dumps({
        "metric": "ModelNet40 train throughput (B=8, N=5000, bf16 full step)",
        "value": round(clouds_per_sec, 2),
        "unit": "point clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / REF_CLOUDS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
