"""`sonet` — the single installed entry point for every task driver.

The reference scatters its user surface over per-task scripts
(modelnet/train.py, part-seg/train.py, autoencoder/train.py,
shrec16/train.py + test.py) that only work from a source checkout.
Here one console script reaches everything, from a checkout or an
installed wheel:

    sonet classify   --preset modelnet40 --dataroot ...   # train
    sonet partseg    --preset shapenetpart ...            # train
    sonet autoencode --preset autoencoder ...             # train
    sonet retrieve   --preset shrec16 ...                 # train + rank
    sonet infer      --run <dir> [--split test]           # batch inference
    sonet serve      --run <dir> --port 8000              # HTTP daemon
    sonet export     --run <dir> [--poly_batch]           # AOT StableHLO
    sonet import-ckpt --encoder <pth> ...                 # .pth migration
    sonet prep       {sample,som,check,...}               # data prep

Each subcommand defers to ``sonet_tpu.tasks.<name>.main(argv)`` (or
``sonet_tpu.data.prep.main``), so ``sonet <cmd> --help`` shows that
driver's full flag set.  Imports are lazy: listing help must not pay
for jax/flax startup.
"""

from __future__ import annotations

import sys

# subcommand -> (module path, one-line help)
_COMMANDS = {
    "classify": ("sonet_tpu.tasks.classify",
                 "train classification (ModelNet40/10, SHREC, MNIST)"),
    "partseg": ("sonet_tpu.tasks.partseg",
                "train part segmentation (ShapeNetPart)"),
    "segment": ("sonet_tpu.tasks.partseg",
                "alias of partseg"),
    "autoencode": ("sonet_tpu.tasks.autoencode",
                   "train the point-cloud autoencoder (Chamfer)"),
    "retrieve": ("sonet_tpu.tasks.retrieve",
                 "train + evaluate SHREC16 retrieval (rank files, mAP/P@k)"),
    "reproduce": ("sonet_tpu.tasks.reproduce",
                  "archive -> ingest -> som -> check -> train -> gated "
                  "verdict, one command"),
    "infer": ("sonet_tpu.tasks.infer",
              "restore a run and stream a split (predictions + metrics)"),
    "serve": ("sonet_tpu.tasks.serve",
              "HTTP model server (JSON/npz predict API)"),
    "export": ("sonet_tpu.tasks.export",
               "AOT-export a run to a StableHLO serving artifact"),
    "import-ckpt": ("sonet_tpu.tasks.import_ckpt",
                    "import reference .pth checkpoints into a run dir"),
    "monitor": ("sonet_tpu.tasks.monitor",
                "live training dashboard (SVG charts over run metrics)"),
    "prep": ("sonet_tpu.data.prep",
             "dataset preparation (sample meshes, fit SOMs, check trees)"),
}


def _usage() -> str:
    lines = ["usage: sonet <command> [flags]   (sonet <command> --help "
             "for that command's flags)", "", "commands:"]
    for name, (_, help_line) in _COMMANDS.items():
        lines.append(f"  {name:<12} {help_line}")
    return "\n".join(lines)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(_usage())
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd not in _COMMANDS:
        print(f"sonet: unknown command {cmd!r}\n\n{_usage()}",
              file=sys.stderr)
        return 2
    module_path, _ = _COMMANDS[cmd]
    import importlib

    module = importlib.import_module(module_path)
    result = module.main(rest)
    # task mains return their payload (metrics dict, manifest, ...) for
    # programmatic callers; as a process exit code that means success.
    # bool is excluded: it subclasses int, and a main returning True
    # must not become exit code 1 (ADVICE r2).
    if isinstance(result, int) and not isinstance(result, bool):
        return result
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
