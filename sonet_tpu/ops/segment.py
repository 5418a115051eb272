"""Node pooling: batched segment max / sum / mean over SOM-node ids.

This is the TPU-native replacement for the reference's only custom CUDA
kernel, ``index_max`` (models/index_max_ext/index_max_cuda.cu:66-100,
index_max.cpp:33-112): given per-point features and a node id per point,
reduce features per node.

The reference returns the arg-max *index* and gathers afterwards because
PyTorch autograd needed a differentiable gather (models/networks.py:182-185).
In JAX the masked max itself is differentiable (gradient flows to the
arg-max element), so we return values directly.

Empty-node semantics (parity-critical, SURVEY.md §7): the reference
gathers with ``gather_index * mask_row_max`` so an empty node reads the
feature of stacked point 0 (networks.py:185).  ``segment_max`` reproduces
that: empty segment -> ``data[..., 0, :]``.

Two implementations are provided and cross-checked in tests:

* ``segment_max_onehot`` — per-node masked max expressed so XLA fuses the
  (B, N, M, C) broadcast into the reduction loop (never materialized);
* ``segment_max_scatter`` — ``jax.ops.segment_max`` vmapped over batch.

``segment_max`` picks the default (onehot: MXU/VPU-friendly, no serialized
scatter).  A fused Pallas kernel can be slotted in behind the same API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e10  # reference uses -1000 (index_max_cuda.cu:72); any value
# below the true min works because empty nodes are patched afterwards.


def _empty_patch(out: jax.Array, data: jax.Array, counts: jax.Array) -> jax.Array:
    """empty node -> feature of point 0 (networks.py:185 semantics)."""
    point0 = data[..., 0:1, :]  # (B, 1, C)
    empty = (counts == 0)[..., None]  # (B, M, 1)
    return jnp.where(empty, point0, out)


def segment_counts(seg_ids: jax.Array, num_segments: int) -> jax.Array:
    """(B, N) int ids -> (B, M) counts."""
    B = seg_ids.shape[0]
    return jnp.zeros((B, num_segments), jnp.int32).at[
        jnp.arange(B)[:, None], seg_ids].add(1)


def segment_max_onehot(data: jax.Array, seg_ids: jax.Array, num_segments: int,
                       counts: jax.Array | None = None,
                       block_m: int = 16) -> jax.Array:
    """Masked segment max, blocked over segments to bound the virtual
    (B, N, Mb, C) broadcast that XLA fuses into its reduce.

    data: (B, N, C); seg_ids: (B, N) int32 -> (B, M, C).
    """
    B, N, C = data.shape
    M = num_segments
    if counts is None:
        counts = segment_counts(seg_ids, M)

    ids = seg_ids[:, :, None]  # (B, N, 1)

    def one_block(m0):
        mids = m0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_m), 2)
        mask = ids == mids  # (B, N, Mb)
        # (B, N, Mb, C) is virtual: XLA fuses select+broadcast into the reduce.
        masked = jnp.where(mask[..., None], data[:, :, None, :], _NEG_INF)
        return jnp.max(masked, axis=1)  # (B, Mb, C)

    nblocks = -(-M // block_m)
    if nblocks * block_m != M:
        # pad segment count up; extra segments are empty and sliced away
        M_pad = nblocks * block_m
    else:
        M_pad = M
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block_m
    blocks = jax.lax.map(one_block, starts)  # (nb, B, Mb, C)
    out = jnp.transpose(blocks, (1, 0, 2, 3)).reshape(B, M_pad, C)[:, :M]
    return _empty_patch(out, data, counts)


def segment_max_scatter(data: jax.Array, seg_ids: jax.Array, num_segments: int,
                        counts: jax.Array | None = None) -> jax.Array:
    """jax.ops.segment_max vmapped over batch (scatter-based baseline)."""
    if counts is None:
        counts = segment_counts(seg_ids, num_segments)
    out = jax.vmap(
        functools.partial(jax.ops.segment_max, num_segments=num_segments)
    )(data, seg_ids)
    out = jnp.where((counts == 0)[..., None], 0.0, out)  # segment_max gives -inf
    return _empty_patch(out, data, counts)


def segment_max(data: jax.Array, seg_ids: jax.Array, num_segments: int,
                counts: jax.Array | None = None) -> jax.Array:
    """Default node-pooling entry point (see module docstring)."""
    return segment_max_onehot(data, seg_ids, num_segments, counts)


def segment_sum_onehot(data: jax.Array, onehot: jax.Array) -> jax.Array:
    """Segment sum as an MXU matmul with a pre-built one-hot mask.

    data: (B, N, C); onehot: (B, N, M) f32 -> (B, M, C).
    This is how the encoder's ``cluster_mean`` recentering
    (networks.py:139-143) hits the systolic array.
    """
    return jnp.einsum("...nm,...nc->...mc", onehot, data,
                      preferred_element_type=jnp.float32)


def segment_mean_onehot(data: jax.Array, onehot: jax.Array,
                        eps: float = 1e-5) -> jax.Array:
    """Masked per-segment mean: sum / (count + eps) (networks.py:142)."""
    s = segment_sum_onehot(data, onehot)
    cnt = jnp.sum(onehot, axis=-2)[..., None]  # (B, M, 1)
    return s / (cnt + eps)
