"""Checkpoint / resume via orbax.

The reference saves bare ``state_dict`` files per sub-network, never
optimizer state (classifier.py:127-133), and "resume" means loading the
encoder only (--pretrain, modelnet/train.py:33-34).  Here full train
state (params + batch_stats + optimizer + step) is checkpointed
(SURVEY.md §5 'failure detection'), and ``restore_encoder`` provides the
encoder-only transfer path (autoencoder -> part-seg pretraining,
part-seg/options.py:36).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    keep: int = 3) -> str:
    path = os.path.join(_abs(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": np.asarray(state.step)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    # multi-process (--distributed): orbax coordinates the collective
    # save itself (all processes call save; process 0 finalizes), but GC
    # must run once — concurrent rmtree of the same dirs on a shared
    # checkpoint filesystem races
    if jax.process_index() == 0:
        _gc(ckpt_dir, keep)
    return path


def _finalized_steps(root: str) -> list:
    """Completed checkpoint dirs only, ordered by step NUMBER: orbax
    stages an atomic save in a sibling
    ``step_XXXXXXXX.orbax-checkpoint-tmp-*`` dir, so a crash mid-save
    leaves one behind — it must never be resumed from or counted by GC.
    (Numeric sort: lexicographic order breaks past 8 digits.)"""
    import re
    pat = re.compile(r"^step_(\d{8,})$")
    matches = (pat.fullmatch(d) for d in os.listdir(root))
    return [m.group(0) for m in
            sorted((m for m in matches if m),
                   key=lambda m: int(m.group(1)))]


def _gc(ckpt_dir: str, keep: int) -> None:
    import shutil
    root = _abs(ckpt_dir)
    if not os.path.isdir(root):
        return
    for d in _finalized_steps(root)[:-keep]:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    # stale staging dirs from crashed saves: _gc only runs right after
    # a COMPLETED save (wait_until_finished), so any tmp dir is dead
    # weight at full checkpoint size — sweep it
    for d in os.listdir(root):
        if d.startswith("step_") and ".orbax-checkpoint-tmp" in d:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    root = _abs(ckpt_dir)
    if not os.path.isdir(root):
        return None
    steps = _finalized_steps(root)
    return os.path.join(root, steps[-1]) if steps else None


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore full train state (auto-resume)."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step)}
    restored = ckptr.restore(_abs(path), template)
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         step=jax.numpy.asarray(restored["step"]))


def restore_encoder(path: str, state: TrainState) -> TrainState:
    """Encoder-only transfer (--pretrain): load just params['encoder'] and
    matching batch_stats from a full checkpoint of any task model.

    The checkpoint may come from a DIFFERENT task (autoencoder ->
    part-seg transfer), so the live state is no template; one is built
    from the checkpoint's own metadata, with the encoder leaves carrying
    the live state's shardings — restoring onto a different mesh than
    the save mesh stays well-defined (no topology-from-file guessing)."""
    ckptr = ocp.StandardCheckpointer()
    path = _abs(path)
    meta_tree = ckptr.metadata(path).item_metadata.tree

    default = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    def _sds(m, cur=None):
        # non-encoder leaves are discarded after restore; any concrete
        # placement silences the unsafe topology-from-file path
        return jax.ShapeDtypeStruct(
            tuple(m.shape), m.dtype,
            sharding=getattr(cur, "sharding", None) or default)

    template = jax.tree_util.tree_map(_sds, meta_tree)
    template["params"]["encoder"] = jax.tree_util.tree_map(
        _sds, meta_tree["params"]["encoder"], state.params["encoder"])
    if ("batch_stats" in template
            and "encoder" in meta_tree.get("batch_stats", {})
            and state.batch_stats.get("encoder") is not None):
        template["batch_stats"]["encoder"] = jax.tree_util.tree_map(
            _sds, meta_tree["batch_stats"]["encoder"],
            state.batch_stats["encoder"])
    restored = ckptr.restore(path, template)
    params = dict(state.params)
    params["encoder"] = restored["params"]["encoder"]
    bs = dict(state.batch_stats)
    if restored.get("batch_stats") and "encoder" in restored["batch_stats"]:
        bs["encoder"] = restored["batch_stats"]["encoder"]
    return state.replace(params=params, batch_stats=bs)
