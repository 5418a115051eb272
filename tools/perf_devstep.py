"""Device-time train-step profile (scratch)."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from sonet_tpu import config as cfg_mod, train
from sonet_tpu.models import build_model
from sonet_tpu.utils.tprof import device_time

rs = np.random.RandomState(0)

def step_fn(pool, task="classify"):
    cfg = cfg_mod.modelnet40().replace(compute_dtype="bfloat16", pooling=pool)
    model = build_model(cfg)
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
    raw = train_step.__wrapped__
    rng = jax.random.PRNGKey(1)
    f = jax.jit(lambda s: raw(s, batch, rng))
    return f, state

if __name__ == "__main__":
    pools = sys.argv[1:] or ["scatter", "sorted_window"]
    for pool in pools:
        f, state = step_fn(pool)
        total, ops = device_time(f, (state,), iters=10)
        print(f"== {pool}: {total:.3f} ms/step device ==", flush=True)
        for name, ms in sorted(ops.items(), key=lambda x: -x[1])[:24]:
            if not name.startswith("jit_") and len(name) > 3:
                print(f"  {ms:8.3f} ms  {name[:95]}")
