#!/usr/bin/env python3
"""Import reference PyTorch checkpoints into a sonet_tpu run directory.

The reference saves per-sub-network ``state_dict`` files
(``<epoch>_net_encoder.pth`` + ``_net_classifier.pth`` /
``_net_segmenter.pth`` / ``_net_decoder.pth``, models/classifier.py:
127-133).  This converts them (sonet_tpu/compat.py) and writes a
standard run directory — immediately servable, exportable, resumable,
or usable as an encoder-transfer source:

    python tasks/import_ckpt.py --preset modelnet40 \
        --encoder ckpts/300_net_encoder.pth \
        --classifier ckpts/300_net_classifier.pth \
        --out checkpoints/imported_modelnet40
    python tasks/infer.py --run checkpoints/imported_modelnet40

Config flags after the import-specific ones work exactly like the
training drivers (--preset picks the base, any Config field overrides).
The config must describe the architecture the .pth files were trained
with (classes, som_k, surface_normal, feature_num, ...); any mismatch
fails with a per-leaf shape report before anything is written.
"""

import argparse
import json



def main(argv=None):
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--encoder", required=True,
                    help="reference *_net_encoder.pth")
    ap.add_argument("--classifier", help="*_net_classifier.pth "
                                         "(classify/retrieve tasks)")
    ap.add_argument("--segmenter", help="*_net_segmenter.pth (segment)")
    ap.add_argument("--decoder", help="*_net_decoder.pth (autoencode)")
    ap.add_argument("--out", required=True, help="run directory to write")
    ap.add_argument("--step", type=int, default=0,
                    help="step number recorded in the checkpoint")
    args, rest = ap.parse_known_args(argv)

    from sonet_tpu import compat
    from sonet_tpu.config import parse_args

    # default preset follows the head being imported
    preset = ("shapenetpart" if args.segmenter
              else "autoencoder" if args.decoder else "modelnet40")
    cfg = parse_args(rest, preset=preset)

    files = {"encoder": args.encoder}
    for label in ("classifier", "segmenter", "decoder"):
        if getattr(args, label):
            files[label] = getattr(args, label)
    ckpt = compat.import_run(cfg, files, args.out, step=args.step)
    summary = {"run": args.out, "checkpoint": ckpt, "task": cfg.task,
               "imported": files}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
