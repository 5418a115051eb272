"""Device mesh + sharding layer (SURVEY.md §2.3 'TPU-native plan').

The reference has no distributed machinery at all (single GPU,
modelnet/options.py:13); scaling here is expressed entirely as
``jax.sharding`` annotations over a 2-axis mesh:

* ``data``   — batch dimension (data parallel; gradient all-reduce is
  inserted by XLA over ICI).
* ``points`` — the point dimension N (the model's "sequence" axis,
  SURVEY.md §5): per-point shared-MLPs are embarrassingly parallel along
  N, and the only cross-point reductions (segment-max over kN, BN batch
  stats) become XLA collectives automatically under pjit semantics.

Replicated model state + sharded batch is all that's needed at SO-Net's
~3M-parameter scale; the mesh abstraction is in place for tensor-style
shardings if models grow.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = None,
              axis_names: Sequence[str] = ("data", "points"),
              devices=None) -> Mesh:
    """Build a mesh over available devices; default puts everything on
    the data axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    need = int(np.prod(shape))
    if need > len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {need} devices but only "
            f"{len(devices)} are visible ({devices[0].platform}); on a "
            f"single-chip host use mesh shape (1,...) or force a virtual "
            f"CPU mesh (JAX_PLATFORMS=cpu + "
            f"--xla_force_host_platform_device_count=N before backend "
            f"init)")
    arr = np.asarray(devices[:need]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_specs(cfg=None) -> Dict[str, P]:
    """PartitionSpecs for a task batch dict: batch dim on 'data', point
    dim on 'points'; per-shape small tensors (nodes, labels) replicated
    along 'points'."""
    return {
        "pc": P("data", "points", None),
        "sn": P("data", "points", None),
        "node": P("data", None, None),
        "node_knn_I": P("data", None, None),
        "label": P("data"),
        "seg": P("data", "points"),
    }


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh with the canonical specs."""
    specs = batch_specs()
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        spec = specs.get(k, P())
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (model/optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_stacked(stacked: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a CHUNK of K stacked batches, dict of (K, B, ...) arrays,
    with the canonical per-batch specs behind a replicated leading axis
    (the chunk axis is scanned, not sharded)."""
    specs = batch_specs()
    out = {}
    for k, v in stacked.items():
        spec = specs.get(k, P())
        out[k] = jax.device_put(v, NamedSharding(mesh, P(None, *spec)))
    return out
