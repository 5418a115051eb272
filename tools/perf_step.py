"""Full train-step timing at flagship config (scratch)."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from sonet_tpu import config as cfg_mod, train
from sonet_tpu.models import build_model


def step_time(cfg, iters=50):
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
    for _ in range(3):
        state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, rng)
    _ = float(metrics["loss"])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    pools = sys.argv[1:] or ["scatter", "sorted_window"]
    base = cfg_mod.modelnet40().replace(compute_dtype="bfloat16")
    for pool in pools:
        cfg = base.replace(pooling=pool)
        dt = step_time(cfg)
        print(f"pooling={pool}: {dt*1e3:.3f} ms/step = "
              f"{cfg.batch_size/dt:.1f} clouds/s", flush=True)
