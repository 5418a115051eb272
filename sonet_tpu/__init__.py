"""sonet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) SO-Net framework.

A from-scratch rebuild of the capabilities of lijx10/SO-Net (CVPR'18,
arXiv 1803.04249) designed for TPU hardware:

* all geometry ops (point->SOM-node assignment, node pooling, kNN,
  Chamfer) are on-device XLA/Pallas kernels — no Faiss, no host round
  trips (reference: models/index_max_ext/, models/losses.py:192-296,
  data/modelnet_shrec_loader.py:116-150);
* SOM training is a jitted, batched `lax.scan` that runs on TPU both for
  offline dataset preprocessing and online (reference: util/som.py,
  data/build_som/);
* networks are flax modules in channel-last (B, N, C) layout so every
  shared-MLP is a plain MXU matmul (reference: models/layers.py,
  models/networks.py);
* data-parallel / point-parallel scaling is expressed as
  `jax.sharding` over a device mesh (the reference is single-GPU only).

Layout convention: the PyTorch reference uses channel-first ``BxCxN``;
this framework is channel-last ``(B, N, C)`` throughout, which is the
layout XLA tiles onto the TPU MXU/VPU.
"""

__version__ = "0.1.0"

# every subpackage imports lazily on attribute access: `import sonet_tpu`
# (and the `sonet` CLI's help path) must not pay for jax/flax startup.
_LAZY = ("config", "ops", "som", "nn", "models", "train", "data", "parallel",
         "utils", "retrieval", "native", "serving", "compat", "cli", "tasks")


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [*_LAZY, "__version__"]
