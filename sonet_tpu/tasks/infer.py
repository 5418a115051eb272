#!/usr/bin/env python3
"""Batch inference / serving driver (beyond-reference capability).

Loads a finished training run (the directory Trainer writes:
``config.json`` + ``ckpt/``) and streams a dataset split through the
compiled eval step, writing per-item predictions and a JSON summary.
The reference has no inference surface at all beyond the SHREC test
script (shrec16/test.py); this is the deployment entry point for every
task family.

    python tasks/infer.py --run checkpoints/modelnet40            # test split
    python tasks/infer.py --run ... --mode train --batch_size 64
    python tasks/infer.py --run ... --out preds/                  # artifacts
    python tasks/infer.py --run ... --checkpoint path/to/ckpt_000123
    python tasks/infer.py --run ... --mesh_shape 4,2 --batch_size 64
        # serve over a device mesh: batch sharded over 'data', points
        # over 'points', state replicated (XLA inserts the collectives)

Outputs in --out (default <run>/infer):
  * classify/retrieve: ``predictions.csv`` (index,label,pred,correct)
  * segment:  ``predictions.csv`` (index,label,iou,seg_accuracy) and,
    with --dump_arrays, per-item predicted part labels ``pred_%06d.npy``
  * autoencode: ``predictions.csv`` (index,chamfer,fwd,bwd) and, with
    --dump_arrays, reconstructed clouds ``recon_%06d.npy``
  * ``summary.json`` — weighted metrics + sustained clouds/s
"""

import argparse
import csv
import json
import os
import time


import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="run directory (config.json + ckpt/)")
    ap.add_argument("--checkpoint", default=None,
                    help="explicit checkpoint path (default: latest in run)")
    ap.add_argument("--mode", default="test",
                    help="split to stream; 'train' streams the training "
                         "split WITH its augmentation (the training-time "
                         "view of the data)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--dataroot", default=None)
    ap.add_argument("--dump_arrays", action="store_true")
    ap.add_argument("--mesh_shape", default=None,
                    help="serve over a device mesh, e.g. '4,2' or '8' "
                         "(data[,points] axes; batch/points must divide)")
    ap.add_argument("--input_pipeline", default=None,
                    choices=["host", "native"],
                    help="host batch assembly (default: the run's "
                         "setting; 'device' falls back to host — "
                         "inference streams per batch)")
    ap.add_argument("--scan_chunk", type=int, default=16,
                    help="batches per dispatch: chunks of N batches run "
                         "as one lax.scan program (remote hosts pay one "
                         "round-trip per DISPATCH, ~30 ms on a tunnel); "
                         "1 = dispatch every batch")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from sonet_tpu import train
    from sonet_tpu.config import load_config
    from sonet_tpu.data.pipeline import BatchLoader
    from sonet_tpu.models import build_model
    from sonet_tpu.train.trainer import build_dataset

    cfg = load_config(os.path.join(args.run, "config.json"))
    if args.batch_size:
        cfg = cfg.replace(batch_size=args.batch_size)
    if args.dataroot:
        cfg = cfg.replace(dataroot=args.dataroot)
    # inference streams per batch: keep the run's host/native pipeline
    # ('native' = C++ batch assembly, worth it on multi-core hosts);
    # the device-resident pipeline is a training construct — fall back
    pipeline = args.input_pipeline or cfg.input_pipeline
    cfg = cfg.replace(input_pipeline=(
        "host" if pipeline == "device" else pipeline))

    # the serving mesh comes from THIS machine's CLI, not the training
    # run's config (a run trained on 1 chip can serve on 8)
    mesh = None
    if args.mesh_shape:
        from sonet_tpu.parallel import (check_mesh_divisible, make_mesh,
                                        parse_mesh_shape, replicate)
        try:
            shape = parse_mesh_shape(args.mesh_shape)
            check_mesh_divisible(shape, cfg.batch_size, cfg.input_pc_num)
        except ValueError as e:
            raise SystemExit(f"--mesh_shape: {e}")
        mesh = make_mesh(shape, ("data", "points"))
        # keep cfg consistent so the encoder's shard_map pooling can
        # reconstruct this exact mesh at trace time (mesh_for_config)
        cfg = cfg.replace(mesh_shape=shape,
                          mesh_axes=("data", "points"))
    else:
        cfg = cfg.replace(mesh_shape=(1, 1))
    out_dir = args.out or os.path.join(args.run, "infer")
    os.makedirs(out_dir, exist_ok=True)

    dataset = build_dataset(cfg, args.mode)
    loader = BatchLoader(dataset, cfg.batch_size, shuffle=False,
                         drop_last=False, pad_last=True)
    model = build_model(cfg)
    batch0 = next(iter(loader))
    extra = ((jnp.asarray(batch0["label"]),)
             if cfg.task == "segment" else ())
    example = (jnp.asarray(batch0["pc"]), jnp.asarray(batch0["sn"]),
               jnp.asarray(batch0["node"]), *extra)
    state = train.init_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                             example)
    ckpt = args.checkpoint or train.latest_checkpoint(
        os.path.join(args.run, "ckpt"))
    if ckpt is None:
        raise SystemExit(f"no checkpoint found under {args.run}/ckpt")
    state = train.restore_checkpoint(ckpt, state)
    if mesh is not None:
        state = replicate(state, mesh)
    _, eval_step = train.make_steps(model, cfg, 1)

    # chunked evaluation: K batches run as ONE lax.scan program so a
    # remote host pays one dispatch round-trip per chunk, not per batch
    # (tools/perf_latency.py: ~30 ms/dispatch through a tunnel vs
    # 1.7 ms/batch device time)
    # cap the chunk so small splits still produce >= 2 dispatches (the
    # first chunk is the compile warm-up and is excluded from timing)
    K = max(1, min(args.scan_chunk, (len(loader) + 1) // 2))

    @jax.jit
    def scan_eval(st, stacked):
        def body(c, b):
            return c, eval_step(st, b)
        _, ms = jax.lax.scan(body, None, stacked)
        return ms  # metric dict with a leading (K,) axis

    def put_stacked(stacked):
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in stacked.items()}
        from sonet_tpu.parallel import shard_stacked
        return shard_stacked(stacked, mesh)

    rows = []
    sums, seen = {}, 0
    t0 = None
    timed = 0

    def process(batch, m, valid):
        """Per-batch bookkeeping on fetched (host) metrics."""
        nonlocal seen
        base = seen
        seen += valid
        for k, v in m.items():
            if k.endswith("_i"):
                sums[k[:-2]] = sums.get(k[:-2], 0.0) + float(v[:valid].sum())
        if cfg.task in ("classify", "retrieve"):
            pred = np.argmax(m["score"], -1)
            for i in range(valid):
                rows.append([base + i, int(batch["label"][i]), int(pred[i]),
                             int(pred[i] == batch["label"][i])])
        elif cfg.task == "segment":
            pred = np.argmax(m["score"], -1)
            for i in range(valid):
                rows.append([base + i, int(batch["label"][i]),
                             float(m["iou_i"][i]), float(m["correct_i"][i])])
                if args.dump_arrays:
                    np.save(os.path.join(out_dir, f"pred_{base+i:06d}.npy"),
                            pred[i].astype(np.int32))
        else:  # autoencode
            for i in range(valid):
                rows.append([base + i, float(m["loss_i"][i]),
                             float(m["chamfer_fwd_i"][i]),
                             float(m["chamfer_bwd_i"][i])])
                if args.dump_arrays:
                    np.save(os.path.join(out_dir, f"recon_{base+i:06d}.npy"),
                            np.asarray(m["predicted_pc"][i], np.float32))

    pending, valids = [], []

    def flush():
        nonlocal t0, timed
        if not pending:
            return
        # pad a final partial chunk up to the K-length scan shape so it
        # reuses the warm compiled program instead of compiling a second
        # one (padded entries carry valid=0: no rows, sums, or timing)
        while len(pending) < K:
            pending.append(pending[-1])
            valids.append(0)
        if K == 1:
            db = put_stacked({k: v[None] for k, v in pending[0].items()})
        else:
            db = put_stacked({k: np.stack([b[k] for b in pending])
                              for k in pending[0]})
        ms = scan_eval(state, db)
        ms = {k: np.asarray(v) for k, v in ms.items()}  # fetch = sync
        if t0 is None:  # first chunk includes compile; clock starts after
            t0 = time.perf_counter()
        else:
            timed += sum(valids)
        for j, (b, valid) in enumerate(zip(pending, valids)):
            process(b, {k: v[j] for k, v in ms.items()}, valid)
        pending.clear()
        valids.clear()

    for batch in loader:
        valids.append(int(batch.pop("valid", cfg.batch_size)))
        pending.append(batch)
        if len(pending) == K:
            flush()
    flush()

    dt = time.perf_counter() - t0
    header = {"classify": ["index", "label", "pred", "correct"],
              "retrieve": ["index", "label", "pred", "correct"],
              "segment": ["index", "label", "iou", "seg_accuracy"],
              "autoencode": ["index", "chamfer", "chamfer_fwd",
                             "chamfer_bwd"]}[cfg.task]
    with open(os.path.join(out_dir, "predictions.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)

    summary = {k: v / max(seen, 1) for k, v in sums.items()}
    name_map = {"correct": "accuracy", "loss": "loss"}
    summary = {name_map.get(k, k): v for k, v in summary.items()}
    summary["items"] = seen
    summary["checkpoint"] = ckpt
    summary["clouds_per_sec"] = (timed / dt) if dt > 0 and timed else None
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
