#!/usr/bin/env python3
"""Full-scale training soak through the real dataset stack.

Trains any preset through its real dataset loader
(-> BatchLoader | device-resident pipeline -> Trainer) on the TPU and
reports sustained, input-pipeline-INCLUSIVE throughput next to
bench.py's synthetic-batch number, plus the task eval metrics.

    python tools/soak.py --dataroot /root/mn40_scale --epochs 2 \
        --input_pipeline device
    python tools/soak.py --preset shapenetpart \
        --dataroot /root/snpart_scale --epochs 30 --input_pipeline device
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sonet_tpu.config import PRESETS
from sonet_tpu.train.trainer import Trainer


def load_band(preset):
    """-> "LO,HI" from the committed band table (tools/soak_bands.json:
    the 3-seed metric band measured on the hardness-0.x datasets, wide
    enough for seed noise, tight enough that a semantics regression —
    BN stats, tie routing, kNN-graph timing — lands outside it)."""
    import json
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "soak_bands.json")
    if not os.path.exists(path):
        sys.exit(f"--band: committed band table missing: {path}")
    with open(path) as f:
        bands = json.load(f)
    if preset not in bands:
        sys.exit(f"no committed band for preset {preset!r} (have: "
                 f"{sorted(k for k in bands if not k.startswith('_'))})")
    b = bands[preset]
    print(f"band: {preset}: [{b['lo']}, {b['hi']}] on {b['dataset']} "
          f"(hardness {b['hardness']}, {b['epochs']} epochs, "
          f"seeds {b['seeds']})", flush=True)
    return f"{b['lo']},{b['hi']}"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--preset", default="modelnet40",
                   choices=sorted(PRESETS.keys()))
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--input_pipeline", default="host",
                   choices=("host", "device"))
    p.add_argument("--out", default="/tmp/soak_ckpt")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--assert_band", default=None, metavar="LO,HI",
                   help="fail (exit 1) unless the task's headline "
                        "metric lands inside [LO, HI] — the committed "
                        "sensitivity band for hardness-tuned soak "
                        "datasets (VERDICT r3 #2; bands in "
                        "docs/DESIGN.md)")
    p.add_argument("--band", action="store_true",
                   help="shorthand: load [LO, HI] for this preset from "
                        "the committed tools/soak_bands.json (the "
                        "3-seed band measured on the hardness-tuned "
                        "datasets; docs/DESIGN.md)")
    args = p.parse_args()
    if args.band and not args.assert_band:
        args.assert_band = load_band(args.preset)

    cfg = PRESETS[args.preset]().replace(
        dataroot=args.dataroot,
        input_pipeline=args.input_pipeline,
        seed=args.seed,
        name=f"soak_{args.preset}_{args.input_pipeline}_s{args.seed}",
        checkpoints_dir=args.out)
    t0 = time.perf_counter()
    trainer = Trainer(cfg, quiet=True, resume=False)
    print(f"setup (incl. data load): {time.perf_counter() - t0:.1f}s",
          flush=True)
    for epoch in range(args.epochs):
        tr = trainer.train_epoch(epoch)
        sps = tr["sec_per_step"]
        extra = " ".join(f"{k} {v:.4f}" for k, v in sorted(tr.items())
                         if k != "sec_per_step")
        print(f"epoch {epoch}: {sps * 1e3:.2f} ms/step sustained = "
              f"{cfg.batch_size / sps:.1f} clouds/s ({extra})", flush=True)
    ev = trainer.evaluate()
    print(f"eval: {ev}", flush=True)

    if args.assert_band:
        lo, hi = (float(x) for x in args.assert_band.split(","))
        key = {"classify": "accuracy", "retrieve": "accuracy",
               "segment": "iou", "autoencode": "loss"}[cfg.task]
        val = ev[key]
        inside = lo <= val <= hi
        print(f"band check: {key} {val:.4f} "
              f"{'INSIDE' if inside else 'OUTSIDE'} [{lo}, {hi}]",
              flush=True)
        if not inside:
            sys.exit(1)


if __name__ == "__main__":
    main()
