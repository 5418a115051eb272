#!/usr/bin/env python3
"""SHREC16 retrieval soak: train the shrec16 preset at scale on the TPU,
then run the full retrieval evaluation (rank files + mAP / P@k) over the
test split — the complete reference workflow (shrec16/train.py +
shrec16/test.py) end to end.

    python tools/soak_retrieval.py --dataroot /root/shrec_scale --epochs 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sonet_tpu import retrieval
from sonet_tpu.config import shrec16
from sonet_tpu.data.pipeline import BatchLoader
from sonet_tpu.train.trainer import Trainer, build_dataset


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--input_pipeline", default="device")
    p.add_argument("--out", default="/tmp/soak_shrec")
    p.add_argument("--per_class_block", type=int, default=90,
                   help="generator ids per class (make_shrec_scale "
                        "--per_class)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--assert_band", default=None, metavar="LO,HI",
                   help="fail (exit 1) unless test mAP lands inside "
                        "[LO, HI] (VERDICT r3 #2; bands in "
                        "docs/DESIGN.md)")
    p.add_argument("--band", action="store_true",
                   help="shorthand: load [LO, HI] from the committed "
                        "tools/soak_bands.json (key 'shrec16')")
    args = p.parse_args()
    if args.band and not args.assert_band:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from soak import load_band  # tools/soak.py
        args.assert_band = load_band("shrec16")

    cfg = shrec16().replace(dataroot=args.dataroot,
                            input_pipeline=args.input_pipeline,
                            seed=args.seed,
                            name=f"soak_shrec_s{args.seed}",
                            checkpoints_dir=args.out)
    t0 = time.perf_counter()
    trainer = Trainer(cfg, quiet=True, resume=False)
    print(f"setup: {time.perf_counter() - t0:.1f}s", flush=True)
    for epoch in range(args.epochs):
        tr = trainer.train_epoch(epoch)
        sps = tr["sec_per_step"]
        print(f"epoch {epoch}: {sps * 1e3:.2f} ms/step = "
              f"{cfg.batch_size / sps:.1f} clouds/s "
              f"(loss {tr.get('loss', float('nan')):.4f} "
              f"acc {tr.get('accuracy', float('nan')):.3f})", flush=True)
    ev = trainer.evaluate()
    print(f"val eval: {ev}", flush=True)

    # retrieval over the test split (host loader carries the shape ids)
    test_set = build_dataset(cfg, "test")
    loader = BatchLoader(test_set, cfg.batch_size, shuffle=False,
                         drop_last=False, pad_last=True)

    def device_batch(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}

    scores, _fake_labels, ids = retrieval.extract_scores(
        trainer.eval_step, trainer.state, loader, device_batch)
    results = retrieval.rank_all(scores)
    # The dataset's test labels are fake (int(name) % 55, reference
    # parity: the real SHREC test labels were hidden).  The generator
    # allocates ids in per-class blocks, so ground truth is id // block.
    true_labels = ids // args.per_class_block
    metrics = retrieval.retrieval_metrics(results, true_labels)
    out_dir = os.path.join(args.out, "rank")
    retrieval.write_rank_files(results, ids, out_dir)
    print(f"wrote {len(results)} rank files to {out_dir}")
    print("retrieval metrics (ground-truth labels):",
          {k: round(v, 4) for k, v in metrics.items()}, flush=True)

    if args.assert_band:
        lo, hi = (float(x) for x in args.assert_band.split(","))
        val = metrics["mAP"]
        inside = lo <= val <= hi
        print(f"band check: mAP {val:.4f} "
              f"{'INSIDE' if inside else 'OUTSIDE'} [{lo}, {hi}]",
              flush=True)
        if not inside:
            sys.exit(1)


if __name__ == "__main__":
    main()
