#!/usr/bin/env python3
"""Export a finished run as a self-contained serving artifact.

AOT deployment entry point (beyond-reference; the reference can only
re-load ``.pth`` files inside its own training code,
shrec16/test.py:31-32).  The artifact embeds parameters + BN stats in a
serialized StableHLO program (``jax.export``) and is runnable with jax
alone — no sonet_tpu code, config, or checkpoint files.

    python tasks/export.py --run checkpoints/modelnet40
    python tasks/export.py --run ... --batch_size 64 --platforms cpu,tpu
    python tasks/export.py --run ... --check      # reload + verify

``--platforms cpu`` (or any list containing cpu) produces a portable
pure-XLA artifact; a tpu-only export keeps the Pallas pooling kernel.
See sonet_tpu/serving.py for the calling convention.
"""

import argparse
import json
import os



def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True,
                    help="run directory (config.json + ckpt/)")
    ap.add_argument("--out", default=None,
                    help="artifact directory (default <run>/export)")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. 'tpu' or 'cpu,tpu' "
                         "(default: current backend)")
    ap.add_argument("--poly_batch", action="store_true",
                    help="any-batch-size artifact. On non-cpu platform "
                         "lists: per-bucket fixed-shape blobs that keep the "
                         "fast Pallas pooling kernel; with cpu: one "
                         "symbolic-batch blob on the portable scatter path "
                         "(each new batch size compiles at load time)")
    ap.add_argument("--buckets", dest="bucketed", default=None,
                    action="store_true",
                    help="with --poly_batch: force per-bucket blobs even "
                         "for cpu platform lists (fixed shapes, no "
                         "load-time recompiles; pooling still portable)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and run it on zeros")
    args = ap.parse_args(argv)

    from sonet_tpu.serving import export_run, load_exported

    platforms = (args.platforms.split(",") if args.platforms else None)
    manifest = export_run(args.run, out_dir=args.out,
                          batch_size=args.batch_size,
                          checkpoint=args.checkpoint, platforms=platforms,
                          poly_batch=args.poly_batch, bucketed=args.bucketed)
    out = args.out or os.path.join(args.run, "export")
    if args.check:
        import numpy as np
        fn, m = load_exported(out)
        outs = np.asarray(fn(*(np.zeros([d or 1 for d in i["shape"]],
                                        i["dtype"])
                               for i in m["inputs"])))
        manifest["check"] = {"output_shape": list(outs.shape),
                             "finite": bool(np.isfinite(outs).all())}
    print(json.dumps(manifest))
    return manifest


if __name__ == "__main__":
    main()
