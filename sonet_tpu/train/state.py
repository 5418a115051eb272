"""Train state + optimizer factory.

Reference training state: two Adam optimizers (betas 0.9/0.999, no weight
decay) over encoder and head (classifier.py:29-36), lr halved every
``lr_decay_step`` epochs with a 1e-5 clip (classifier.py:135-154,
modelnet/train.py:105-111), encoder lr scaled by ``pretrain_lr_ratio``
when transferring (classifier.py:23-26).

Here that becomes one ``optax.multi_transform`` with per-subnetwork
step-indexed schedules (epoch = step // steps_per_epoch is deterministic,
so the reference's imperative halving is an exact closed form:
``max(lr0 * ratio^(epoch // decay_step), clip)``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            opt_state=new_opt_state)

    @classmethod
    def create(cls, *, apply_fn, params, batch_stats, tx) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)


def halving_schedule(lr0: float, decay_step_epochs: int, ratio: float,
                     clip: float, steps_per_epoch: int):
    """Closed form of the reference's update_learning_rate loop.

    The reference decays AFTER epoch e finishes, when ``e % step == 0
    and e > 0`` (modelnet/train.py:105-111 and the three sibling
    loops), so epoch e itself still trains at the old lr and the decay
    takes effect from epoch e+1: halvings during epoch e =
    ``floor((e-1)/step)`` (e >= 1), not ``floor(e/step)`` — pinned
    against a replayed reference loop in tests/test_parity.py."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        halvings = jnp.maximum(epoch - 1, 0) // max(decay_step_epochs, 1)
        lr = lr0 * (ratio ** halvings.astype(jnp.float32))
        return jnp.maximum(lr, clip)

    return schedule


def make_optimizer(cfg, steps_per_epoch: int,
                   head_names: tuple[str, ...] = ("classifier", "segmenter",
                                                  "decoder", "transformer"),
                   ) -> optax.GradientTransformation:
    """Per-subnetwork Adam with the reference lr schedule.

    The params tree's top-level keys are subnetwork names (models.py);
    ``encoder`` gets ``lr * pretrain_lr_ratio`` when a pretrain path is
    set (classifier.py:23-26), heads get the base lr.
    """
    enc_lr0 = cfg.lr * (cfg.pretrain_lr_ratio if cfg.pretrain else 1.0)

    def adam_for(lr0):
        return optax.adam(
            learning_rate=halving_schedule(lr0, cfg.lr_decay_step,
                                           cfg.lr_decay_ratio, cfg.lr_clip,
                                           steps_per_epoch),
            b1=0.9, b2=0.999)

    def label_fn(params):
        from flax import traverse_util
        flat = traverse_util.flatten_dict(params)
        labels = {k: ("encoder" if k[0] == "encoder" else "head")
                  for k in flat}
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform(
        {"encoder": adam_for(enc_lr0), "head": adam_for(cfg.lr)}, label_fn)


def init_state(model, cfg, rng, example_batch,
               steps_per_epoch: int = 100) -> TrainState:
    """Initialize params/batch_stats from an example batch dict and build
    the optimizer."""
    init_rngs = {"params": rng, "dropout": jax.random.fold_in(rng, 1)}
    variables = model.init(init_rngs, *example_batch, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch))
