"""Multi-process training worker (NOT collected by pytest).

Launched by tests/test_distributed.py as N separate OS processes, each
with ONE CPU device, rendezvousing through --distributed
'127.0.0.1:PORT,N,PID' — the same code path a TPU pod host runs with
--distributed auto. Writes its final metrics as JSON for the parent
test to cross-check against the in-process single-process mesh run.

Modes (argv[5], default "plain"):

* ``plain``   — 2 epochs through the resident device pipeline.
* ``preempt`` — 4 epochs with a tiny ``--device_budget_gb`` (forces the
  CHUNKED streaming pipeline under multi-process) and a SIGTERM
  delivered to process 1 ONLY after epoch 1: the collective stop
  decision (trainer._should_stop all-gather) must stop EVERY process at
  that epoch boundary with a checkpoint — a lone early exit would
  deadlock the others in the next collective.
* ``host``    — 2 epochs through the HOST input pipeline (threaded
  BatchLoader + per-batch shard_batch puts + per-step collective stop
  checks), the path where transfers must stay on the main thread.
* ``sharded`` — 2 epochs with ``--dataset_placement sharded``: the
  train split is split over the pod's data axis and EACH PROCESS must
  stack only its own shard's items (per-process loading); the worker
  records ``local_items`` so the parent can assert the partition.

Usage: python tests/dist_worker.py PID NPROC PORT OUTDIR [MODE]
"""

import json
import os
import signal
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "plain"
    import jax

    # mirror tests/conftest.py: the axon TPU plugin force-registers at
    # interpreter boot and overrides JAX_PLATFORMS; re-forcing via
    # config before backend init wins. Matmul precision must match the
    # parent test's in-process baseline for the equality check.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from sonet_tpu import config as cfg_mod
    from sonet_tpu.train.trainer import Trainer

    cfg = cfg_mod.tiny_test().replace(
        distributed=f"127.0.0.1:{port},{nproc},{pid}",
        input_pipeline="device",
        epochs=2,
        checkpoints_dir=outdir,  # SHARED dir: exercises collective saves
        name="dist",
        seed=7,
    )
    if mode == "host":
        cfg = cfg.replace(input_pipeline="host", name="host")
    if mode == "sharded":
        cfg = cfg.replace(dataset_placement="sharded", name="sharded")
    if mode == "preempt":
        # ~50 KB budget on a ~110 KB split -> several 4-item chunks:
        # the double-buffered chunked pipeline, cross-process
        cfg = cfg_mod.tiny_test().replace(
            distributed=f"127.0.0.1:{port},{nproc},{pid}",
            input_pipeline="device", epochs=4, device_budget_gb=5e-5,
            checkpoints_dir=outdir, name="preempt", seed=7)

    class PreemptTrainer(Trainer):
        """SIGTERM lands on process 1 ONLY, after train epoch 1 — the
        real signal handler sets the local stop flag; the collective
        all-gather must propagate it to every process."""

        def train_epoch(self, epoch):
            out = super().train_epoch(epoch)
            if epoch == 1 and jax.process_index() == 1:
                os.kill(os.getpid(), signal.SIGTERM)
            return out

    cls = PreemptTrainer if mode == "preempt" else Trainer
    trainer = cls(cfg, quiet=True, log_every=1)  # per-step loss rows
    assert trainer.multiprocess, "distributed runtime did not come up"
    assert jax.device_count() == nproc, jax.device_count()
    final = trainer.fit()

    from sonet_tpu.data.device_pipeline import ShardedDeviceSplit
    extra = {}
    if isinstance(trainer.device_train, ShardedDeviceSplit):
        extra = {"local_items": trainer.device_train.local_items,
                 "split_size": trainer.device_train.size}
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump({
            "pid": pid,
            "process_index": jax.process_index(),
            "device_count": jax.device_count(),
            "mesh_shape": list(trainer.cfg.mesh_shape),
            "final": {k: float(v) for k, v in final.items()},
            "best": (None if trainer.best_metric is None
                     else float(trainer.best_metric)),
            "step": int(trainer.state.step),
            **extra,
        }, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
