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


def mesh_for_config(cfg) -> Mesh:
    """The canonical mesh for ``cfg.mesh_shape`` — the exact mesh every
    entry point builds (``make_mesh`` over ``jax.devices()`` in order).

    Used at trace time by ops that need a concrete ``Mesh`` object for
    ``shard_map`` (the Pallas pooling kernel has no GSPMD partitioning
    rules, so under a >1-device mesh it runs per-shard inside shard_map
    with a cross-shard ``pmax`` over the points axis).  Entry points
    that build a *custom* mesh (reordered / subset devices) must either
    match this reconstruction or pin ``pooling='scatter'``."""
    return make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))


def normalize_mesh_shape(shape: Sequence[int]) -> tuple:
    """Validate a (data[, points]) mesh shape and pad it to 2 axes.

    Raises ValueError on anything but 1-2 positive ints."""
    try:
        norm = tuple(int(s) for s in shape)
    except (TypeError, ValueError):
        raise ValueError(f"mesh shape {shape!r}: want (data,) or "
                         f"(data, points) positive ints") from None
    if not 1 <= len(norm) <= 2 or any(s < 1 for s in norm):
        raise ValueError(f"mesh shape {shape!r}: want (data,) or "
                         f"(data, points) positive ints")
    return norm + (1,) * (2 - len(norm))


def parse_mesh_shape(text: str) -> tuple:
    """Parse a CLI mesh-shape string ('4,2', '4x2', '8') to a normalized
    2-tuple.  One parser for every entry point (tasks/{infer,serve}.py,
    ServingEngine) so junk like ',' or 'x' is rejected everywhere."""
    tokens = [t.strip() for t in str(text).replace("x", ",").split(",")]
    tokens = [t for t in tokens if t]
    if not tokens:
        raise ValueError(f"mesh shape {text!r}: no axis sizes found "
                         f"(want e.g. '8' or '4,2')")
    try:
        shape = tuple(int(t) for t in tokens)
    except ValueError:
        raise ValueError(f"mesh shape {text!r}: want comma- or "
                         f"'x'-separated positive ints") from None
    return normalize_mesh_shape(shape)


def check_mesh_divisible(shape: Sequence[int], batch_size: int,
                         input_pc_num: int) -> None:
    """Serving-layout divisibility: batch over 'data', points over
    'points'.  Raises ValueError with the offending axis."""
    if batch_size % shape[0]:
        raise ValueError(f"batch_size {batch_size} must divide over the "
                         f"data axis ({shape[0]})")
    if input_pc_num % shape[1]:
        raise ValueError(f"input_pc_num {input_pc_num} must divide over "
                         f"the points axis ({shape[1]})")


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
    """Fully replicate a pytree (model/optimizer state) over the mesh.

    ALIAS-SAFE: the input tree is NOT consumed.  A bare ``device_put``
    onto a replicated sharding aliases the source buffer for the shard
    living on the origin device (``may_alias=False`` does NOT prevent
    this — measured on jax 0.9.0 CPU: the replicated output dies with
    the donated source); if the caller later passes the ORIGINAL tree
    to a donating step (``train_step`` donates its state,
    train/loops.py), the donation frees that shared buffer and the
    replicated copy dies with it ("Array has been deleted").  So:
    stage with ``device_put`` (which accepts ANY source placement —
    a checkpoint-restored tree is committed to specific devices, and
    jit refuses committed inputs whose devices mismatch
    ``out_shardings``), then copy through a jitted identity, which
    always materializes fresh buffers.  One-time startup copy; the
    possibly-aliased staged intermediate is dropped.

    Multi-process: cross-process ``device_put`` is only defined for
    host-side values that are identical on every process, so leaves are
    first materialized to numpy (``fetch_global`` all-gathers any leaf a
    process can't read locally; numpy sources never alias device
    buffers). One-time startup cost; identical values are guaranteed by
    the deterministic seeded init."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        from .distributed import fetch_global
        return jax.device_put(fetch_global(tree), sharding)
    staged = jax.device_put(tree, sharding)
    return jax.jit(lambda t: t, out_shardings=sharding)(staged)


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
