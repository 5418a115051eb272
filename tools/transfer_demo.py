#!/usr/bin/env python3
"""Encoder-transfer demonstration: autoencoder pretrain -> part-seg
fine-tune, the reference's cross-task workflow (part-seg/options.py:36
loads an autoencoder checkpoint via --pretrain with pretrain_lr_ratio).

Trains the AE at scale, saves a full orbax checkpoint, restores the
ENCODER ONLY into a fresh segmenter (train.checkpoints.restore_encoder —
cross-task tree surgery with live shardings), fine-tunes, and prints the
pretrained-vs-scratch comparison at equal step budgets.

    python tools/transfer_demo.py --dataroot /root/snpart_scale \
        --ae_epochs 12 --seg_epochs 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sonet_tpu.config import autoencoder, shapenetpart
from sonet_tpu.train import checkpoints
from sonet_tpu.train.trainer import Trainer


def run_seg(cfg, epochs, tag):
    trainer = Trainer(cfg, quiet=True, resume=False)
    for epoch in range(epochs):
        tr = trainer.train_epoch(epoch)
        print(f"  [{tag}] epoch {epoch}: loss {tr.get('loss', 0):.4f} "
              f"seg_acc {tr.get('seg_accuracy', 0):.4f}", flush=True)
    ev = trainer.evaluate()
    print(f"  [{tag}] eval: iou {ev['iou']:.4f} "
          f"seg_acc {ev['seg_accuracy']:.4f} loss {ev['loss']:.4f}",
          flush=True)
    return ev


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--ae_epochs", type=int, default=12)
    p.add_argument("--seg_epochs", type=int, default=3)
    p.add_argument("--out", default="/tmp/transfer_demo")
    args = p.parse_args()

    # 1) AE pretrain + full checkpoint
    ae_cfg = autoencoder().replace(dataroot=args.dataroot,
                                   input_pipeline="device",
                                   name="ae_pre", checkpoints_dir=args.out)
    t0 = time.perf_counter()
    ae = Trainer(ae_cfg, quiet=True, resume=False)
    for epoch in range(args.ae_epochs):
        tr = ae.train_epoch(epoch)
        print(f"[ae] epoch {epoch}: chamfer {tr.get('chamfer', 0):.4f}",
              flush=True)
    ckpt = checkpoints.save_checkpoint(
        os.path.join(args.out, "ae_ckpt"), ae.state, int(ae.state.step))
    print(f"[ae] checkpoint: {ckpt} ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    # 2) part-seg fine-tune from the AE encoder vs from scratch
    base = shapenetpart().replace(dataroot=args.dataroot,
                                  input_pipeline="device",
                                  checkpoints_dir=args.out)
    print("fine-tune WITH AE-pretrained encoder "
          "(restore_encoder, pretrain_lr_ratio=0.1):", flush=True)
    ev_pre = run_seg(base.replace(pretrain=ckpt, pretrain_lr_ratio=0.1,
                                  name="seg_pre"),
                     args.seg_epochs, "pretrained")
    print("fine-tune FROM SCRATCH (same step budget):", flush=True)
    ev_scr = run_seg(base.replace(name="seg_scratch"),
                     args.seg_epochs, "scratch")
    print(f"transfer delta: iou {ev_pre['iou'] - ev_scr['iou']:+.4f}, "
          f"seg_acc {ev_pre['seg_accuracy'] - ev_scr['seg_accuracy']:+.4f}")


if __name__ == "__main__":
    main()
