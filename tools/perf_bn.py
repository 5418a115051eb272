"""BatchNorm cost ablation at flagship config (scratch).

Measures the full train step and the eval step with normalization=batch
vs normalization=None (modelnet40 preset, bf16) — the measurement gate
for the fused-BN round-3 lever (CLAUDE.md) and the eval-form BN folding
the round-1 verdict asked for.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from sonet_tpu import config as cfg_mod, train
from sonet_tpu.models import build_model


def make(cfg):
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
    train_step, eval_step = train.make_steps(model, cfg, 1230)
    return state, batch, train_step, eval_step


def time_train(state, batch, train_step, iters=50):
    rng = jax.random.PRNGKey(1)
    for _ in range(3):
        state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])
    return (time.perf_counter() - t0) / iters


def time_eval(state, batch, eval_step, iters=50):
    for _ in range(3):
        m = eval_step(state, batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = eval_step(state, batch)
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    norms = sys.argv[1:] or ["batch", "none"]
    base = cfg_mod.modelnet40()
    for norm in norms:
        cfg = base.replace(normalization=None if norm == "none" else norm)
        state, batch, tr, ev = make(cfg)
        dt_e = time_eval(state, batch, ev)
        dt_t = time_train(state, batch, tr)  # donates state: run last
        print(f"norm={norm}: train {dt_t*1e3:.3f} ms/step, "
              f"eval {dt_e*1e3:.3f} ms/step", flush=True)
