import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from sonet_tpu import config as cfg_mod
from sonet_tpu.models import build_model

cfg = cfg_mod.tiny_test()
rs = np.random.RandomState(0)
B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
pc = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
sn = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
# nodes with a guaranteed empty cluster: put one node far away
node = jnp.asarray(np.concatenate(
    [rs.randn(B, M - 1, 3), np.full((B, 1, 3), 50.0)], axis=1
).astype(np.float32))

for task in ("classify", "segment"):
    c1 = cfg.replace(task=task, pooling="scatter")
    c2 = cfg.replace(task=task, pooling="sorted_window")
    m1, m2 = build_model(c1), build_model(c2)
    extra = ()
    if task == "segment":
        extra = (jnp.asarray(rs.randint(0, 16, B)),)
    v = m1.init(jax.random.PRNGKey(0), pc, sn, node, *extra, train=False)
    out1, enc1 = m1.apply(v, pc, sn, node, *extra, train=False)
    out2, enc2 = m2.apply(v, pc, sn, node, *extra, train=False)
    print(task, "empty nodes:", int(jnp.sum(enc1.counts == 0)),
          "max |score diff|:", float(jnp.max(jnp.abs(out1 - out2))))
    assert jnp.allclose(out1, out2, atol=2e-5), task

    # gradient equivalence through the full model (relative tolerance:
    # summation order differs -> f32 reassociation noise)
    def loss(params, model, c):
        o, _ = model.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           pc, sn, node, *extra, train=False)
        return jnp.mean(o * o)
    g1 = jax.grad(loss)(v["params"], m1, c1)
    g2 = jax.grad(loss)(v["params"], m2, c2)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) /
                           (jnp.max(jnp.abs(a)) + 1e-12)), g1, g2)
    md = max(jax.tree_util.tree_leaves(d))
    print(task, "max rel grad diff:", md)
    assert md < 1e-4, task
print("OK")
