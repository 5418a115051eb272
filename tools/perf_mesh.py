"""Real-chip mesh-entry overhead: flagship step unsharded vs (1,1) mesh.

VERDICT r2 weak #1 asked for a flagship-shape sharded-step bench: this
box has ONE real chip, so the measurable configuration is the degenerate
``(1,1)`` mesh — it exercises the exact production entry path (replicated
state via ``parallel.replicate``, ``shard_batch`` placement, the step
traced with NamedSharding-committed operands) and should cost ~nothing
over the unsharded step ON DEVICE.  The multi-chip-only parts
(shard_map pooling + cross-shard pmax, gradient all-reduce) are
correctness-pinned on the 8-device virtual CPU mesh (test_sharding.py);
their real-chip cost proxy here is the kernel-level shard_map wrapper
measurement, which times ``windowed_vals`` against the SAME kernel with
the SAME block parameters wrapped in ``jax.shard_map`` on a 1-device
mesh at production shapes — isolating what the shard_map plumbing
itself costs on TPU.

Two timing lanes per step config:
* device ms (tprof profiler lane) — the honest number; the production
  epoch-scan path dispatches once per EPOCH, so per-dispatch host work
  never appears in sustained training, mesh or not.
* wall ms per python-loop dispatch — reported only to quantify the
  tunnel/host dispatch overhead delta a per-step driver would see.

Run (TPU): python tools/perf_mesh.py [iters]
Record results in docs/DESIGN.md ("Mesh entry overhead").
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from sonet_tpu import config as cfg_mod, train
from sonet_tpu.models import build_model
from sonet_tpu.parallel import make_mesh, replicate, shard_batch
from sonet_tpu.utils.profiling import scan_bench
from sonet_tpu.utils.tprof import device_time


def _batch(cfg, rs):
    B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
    return {
        "pc": rs.randn(B, N, 3).astype(np.float32),
        "sn": rs.randn(B, N, 3).astype(np.float32),
        "node": rs.randn(B, M, 3).astype(np.float32),
        "label": rs.randint(0, cfg.classes, B).astype(np.int64),
    }


def step_time(cfg, mesh=None, iters=20):
    """(device ms, wall ms) for one flagship train step."""
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    batch = _batch(cfg, rs)
    state = train.init_state(
        model, cfg, jax.random.PRNGKey(0),
        (jnp.asarray(batch["pc"]), jnp.asarray(batch["sn"]),
         jnp.asarray(batch["node"])), steps_per_epoch=1230)
    train_step, _ = train.make_steps(model, cfg, 1230)
    rng = jax.random.PRNGKey(1)

    if mesh is not None:
        state = replicate(state, mesh)
        db = shard_batch(batch, mesh)
    else:
        db = {k: jnp.asarray(v) for k, v in batch.items()}

    # device lane: the jitted step DONATES the state, so repeated
    # same-args calls would touch deleted buffers — re-jit the
    # unwrapped fn without donation (same trick as bench.py)
    raw = getattr(train_step, "__wrapped__", train_step)
    dev_ms = None
    try:
        dev_ms, _ = device_time(jax.jit(lambda s: raw(s, db, rng)),
                                (state,), iters=iters)
    except Exception as e:  # profiler trace is flaky on this tunnel
        print(f"  (device lane unavailable: {type(e).__name__}: {e})")

    # wall per-dispatch (threaded state, synced by the final fetch —
    # block_until_ready lies on this backend)
    s = state
    for _ in range(3):
        s, metrics = train_step(s, db, rng)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, metrics = train_step(s, db, rng)
    _ = float(metrics["loss"])
    wall_ms = (time.perf_counter() - t0) / iters * 1e3
    return dev_ms, wall_ms


def kernel_shardmap_overhead(iters=200):
    """windowed_vals plain vs shard_map-wrapped on a (1,1) mesh at
    production pooling shapes (B=8, kN=15000, M=64, C=384, bf16) with
    IDENTICAL block parameters (the production ones from
    segment_max_fast: window=8, block_n=512, block_c=C).  scan_bench
    returns SECONDS PER ITERATION already."""
    from sonet_tpu.ops.pallas.segment_max_window import windowed_vals
    from sonet_tpu.ops.segment_fast import windowed_vals_sharded

    B, kN, M, C = 8, 15000, 64, 384
    kw = dict(window=8, block_n=512, block_c=C)
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.randn(B, kN, C), jnp.bfloat16)
    ids = jnp.sort(jnp.asarray(rs.randint(0, M, (B, kN)), jnp.int32),
                   axis=1)
    mesh = make_mesh((1, 1))
    plain = scan_bench(
        lambda d, i: windowed_vals(d, i, M, **kw), (data, ids),
        iters=iters)
    wrapped = scan_bench(
        lambda d, i: windowed_vals_sharded(d, i, M, mesh, **kw),
        (data, ids), iters=iters)
    return plain * 1e3, wrapped * 1e3


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = cfg_mod.modelnet40()  # bf16 production preset

    def fmt(x):
        return f"{x:7.3f} ms" if x is not None else "    n/a"

    ud, uw = step_time(cfg, mesh=None, iters=iters)
    print(f"unsharded step:   device {fmt(ud)}   wall/dispatch "
          f"{fmt(uw)}")

    mesh = make_mesh((1, 1))
    cfg_m = cfg.replace(mesh_shape=(1, 1))
    sd, sw = step_time(cfg_m, mesh=mesh, iters=iters)
    delta = (f"   (device {(sd - ud) / ud * 100:+.1f}% vs unsharded)"
             if sd is not None and ud else "")
    print(f"(1,1)-mesh step:  device {fmt(sd)}   wall/dispatch "
          f"{fmt(sw)}{delta}")

    kp, kw_ = kernel_shardmap_overhead()
    print(f"pooling kernel plain:            {kp:7.3f} ms/iter")
    print(f"pooling kernel shard_map (1,1):  {kw_:7.3f} ms/iter "
          f"({(kw_ - kp) / max(kp, 1e-9) * 100:+.1f}%)")
