"""Task drivers (the reference's per-task ``train.py``/``test.py`` scripts,
modelnet/train.py, part-seg/train.py, autoencoder/train.py, shrec16/test.py).

Each module exposes ``main(argv=None)``. They are reachable three ways:

- installed console script: ``sonet <command> [flags]`` (sonet_tpu.cli),
- ``python -m sonet_tpu.tasks.<name>``,
- repo-checkout wrappers under ``tasks/`` (kept for compatibility).
"""

__all__ = [
    "autoencode", "classify", "export", "import_ckpt",
    "infer", "monitor", "partseg", "retrieve", "serve",
]
