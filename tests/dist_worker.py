"""Multi-process training worker (NOT collected by pytest).

Launched by tests/test_distributed.py as N separate OS processes, each
with ONE CPU device, rendezvousing through --distributed
'127.0.0.1:PORT,N,PID' — the same code path a TPU pod host runs with
--distributed auto. Writes its final metrics as JSON for the parent
test to cross-check against the in-process single-process mesh run.

Usage: python tests/dist_worker.py PID NPROC PORT OUTDIR
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
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
    trainer = Trainer(cfg, quiet=True, log_every=1)  # per-step loss rows
    assert trainer.multiprocess, "distributed runtime did not come up"
    assert jax.device_count() == nproc, jax.device_count()
    final = trainer.fit()

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
        }, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
