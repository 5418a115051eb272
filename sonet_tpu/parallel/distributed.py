"""Multi-process (multi-host) runtime — one SPMD program over a pod.

No reference equivalent: lijx10/SO-Net is strictly single-GPU,
single-process (modelnet/options.py:13 picks one CUDA device). On TPU
pods each host sees only its local chips; ``jax.distributed`` stitches
the processes into one runtime so a single ``jax.sharding.Mesh`` spans
every chip and XLA's collectives ride ICI. The design here keeps the
whole trainer single-program-multiple-data:

* **Same program everywhere.** Every process runs the identical trainer
  code path. All host-side randomness (epoch shuffles, device-pipeline
  index tables, augmentation keys) is already deterministic per
  ``(seed, mode, epoch, index)`` — no global RNG — so every process
  computes byte-identical host values, and ``jax.device_put`` onto a
  cross-process sharding materializes only the process-local shards
  (probed on this image: device_put of identical host arrays to
  non-addressable shardings is supported).
* **Fetch discipline.** Fully-replicated outputs (losses, scalar
  metrics, the train state) can be read with ``np.asarray`` on any
  process; data-sharded outputs (per-item eval ``*_i`` arrays) must go
  through an all-gather first — ``fetch_global`` picks automatically.
* **Process 0 owns the console and metric files**; checkpoints are
  written collectively (orbax coordinates the processes itself).

Spec grammar for ``--distributed`` (Config.distributed):

* ``""``      — off (single process; the default).
* ``"auto"``  — ``jax.distributed.initialize()`` with no arguments:
  on TPU pods the coordinator/process-count/process-id are discovered
  from the TPU metadata (the production path).
* ``"HOST:PORT,NPROC,PID"`` — explicit rendezvous, e.g.
  ``127.0.0.1:29500,2,0``; used by the multi-process CPU tests and by
  clusters without TPU metadata (set PID per worker).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np


def parse_distributed_spec(text: Optional[str]):
    """``--distributed`` string -> None (off) | {} (auto) | explicit
    kwargs for ``jax.distributed.initialize``. Raises ValueError on
    junk rather than silently running single-process."""
    if not text:
        return None
    text = text.strip()
    if text.lower() in ("auto", "tpu"):
        return {}
    parts = [t.strip() for t in text.split(",")]
    if len(parts) != 3 or ":" not in parts[0]:
        raise ValueError(
            f"--distributed {text!r}: want 'auto' or 'HOST:PORT,NPROC,PID'")
    try:
        nproc, pid = int(parts[1]), int(parts[2])
    except ValueError:
        raise ValueError(f"--distributed {text!r}: NPROC and PID must be "
                         f"ints") from None
    if nproc < 1 or not 0 <= pid < nproc:
        raise ValueError(f"--distributed {text!r}: need NPROC >= 1 and "
                         f"0 <= PID < NPROC")
    return {"coordinator_address": parts[0], "num_processes": nproc,
            "process_id": pid}


def maybe_init_distributed(spec: Optional[str]) -> bool:
    """Idempotently bring up the distributed runtime from a spec string.

    Must run before the first device query (jax backend creation);
    Trainer calls it first thing. Returns True iff the runtime is (now)
    multi-process-initialized."""
    kwargs = parse_distributed_spec(spec)
    if kwargs is None:
        return False
    import jax

    if jax.distributed.is_initialized():
        return True  # already up (idempotent: trainer + explicit caller)
    jax.distributed.initialize(**kwargs)
    return True


def process_count() -> int:
    import jax
    return jax.process_count()


def is_main() -> bool:
    """True on the process that owns the console/metric files."""
    import jax
    return jax.process_index() == 0


def fetch_global(tree: Any) -> Any:
    """Materialize a pytree of jax Arrays as host numpy on EVERY process.

    Leaves that are fully addressable (single-process) or fully
    replicated are read directly; data-sharded leaves on a multi-host
    mesh are all-gathered first (``multihost_utils.process_allgather``
    runs a tiny jitted all-gather over the array's own mesh). Non-array
    leaves pass through unchanged."""
    import jax

    def one(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_addressable or x.is_fully_replicated:
            return np.asarray(x)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree_util.tree_map(one, tree)


def sync(name: str = "sonet") -> None:
    """Cross-process barrier (no-op single-process)."""
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
