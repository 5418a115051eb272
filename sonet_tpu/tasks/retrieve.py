#!/usr/bin/env python3
"""SHREC16 retrieval test driver (reference shrec16/test.py).

    python tasks/retrieve.py --preset shrec16 --dataroot /path --pretrain ckpt \
        [--output_dir ./retrieval]
"""

import argparse
import math
import os


import jax
import jax.numpy as jnp

from sonet_tpu.config import parse_args
from sonet_tpu import retrieval, train
from sonet_tpu.models import build_model
from sonet_tpu.train.trainer import build_dataset
from sonet_tpu.data.pipeline import BatchLoader


def main(argv=None):
    out_pre = argparse.ArgumentParser(add_help=False)
    out_pre.add_argument("--output_dir", default="./retrieval")
    out_pre.add_argument("--checkpoint", default=None,
                         help="full train-state checkpoint to load")
    known, rest = out_pre.parse_known_args(argv)
    cfg = parse_args(rest, preset="shrec16")

    # --mesh_shape D[,P]: shard the evaluation over a device mesh
    # (state replicated, batches data/points-sharded) like tasks/infer.py
    mesh = None
    if math.prod(cfg.mesh_shape) > 1:
        from sonet_tpu.parallel import (make_mesh, replicate, shard_batch,
                                        shard_stacked)
        shape = tuple(cfg.mesh_shape)
        shape += (1,) * (len(cfg.mesh_axes) - len(shape))
        mesh = make_mesh(shape, cfg.mesh_axes)
        cfg = cfg.replace(mesh_shape=shape)
        if cfg.batch_size % shape[0] or cfg.input_pc_num % shape[1]:
            raise SystemExit(f"batch_size/input_pc_num must divide over "
                             f"mesh {shape}")

    model = build_model(cfg)
    test_set = build_dataset(cfg, "test")
    loader = BatchLoader(test_set, cfg.batch_size, shuffle=False,
                         drop_last=False, pad_last=True)
    batch0 = next(iter(loader))
    example = (jnp.asarray(batch0["pc"]), jnp.asarray(batch0["sn"]),
               jnp.asarray(batch0["node"]))
    state = train.init_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                             example)
    if known.checkpoint:
        state = train.restore_checkpoint(known.checkpoint, state)
    if mesh is not None:
        state = replicate(state, mesh)
    _, eval_step = train.make_steps(model, cfg, 1)

    def device_batch(b):
        b = {k: v for k, v in b.items() if k != "valid"}
        if mesh is not None:
            return shard_batch(b, mesh)
        return {k: jnp.asarray(v) for k, v in b.items()}

    put_stacked = ((lambda d: shard_stacked(d, mesh))
                   if mesh is not None else None)
    scores, labels, ids = retrieval.extract_scores(
        eval_step, state, loader, device_batch,
        scan_chunk=max(1, min(16, (len(loader) + 1) // 2)),
        put_stacked=put_stacked)
    results = retrieval.rank_all(scores)
    metrics = retrieval.retrieval_metrics(results, labels)
    retrieval.write_rank_files(results, ids, known.output_dir)
    gallery = retrieval.write_retrieval_gallery(
        results, ids, test_set, os.path.join(known.output_dir, "gallery"))
    print(f"wrote {len(results)} rank files to {known.output_dir}; "
          f"gallery at {gallery}")
    print({k: round(v, 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
