"""Pairwise-distance and top-k assignment ops.

These replace three native components of the reference:

* ``BatchSOM.query_topk`` (util/som.py:237-269) — point -> SOM-node
  top-k assignment, there done by materializing a BxCxNxM difference
  tensor; here the squared distance is a single MXU matmul.
* the Faiss ``IndexFlatL2`` self-kNN of SOM nodes in the dataloaders
  (data/modelnet_shrec_loader.py:116-150, data/shapenet_loader.py:46-80);
* the O(M^2) on-the-fly kNN fallback in KNNModule (models/layers.py:333-337).

Everything is channel-last: points are ``(..., N, C)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distance between two point sets.

    a: (..., N, C), b: (..., M, C) -> (..., N, M).

    Computed as |a|^2 + |b|^2 - 2 a.b so the dominant cost is one batched
    matmul that XLA tiles onto the MXU (instead of the reference's
    broadcasted BxCxNxM subtraction, util/som.py:245-250).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # (..., N, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)  # (..., M, 1)
    ab = jnp.einsum("...nc,...mc->...nm", a, b,
                    preferred_element_type=jnp.float32)
    d = a2 + jnp.swapaxes(b2, -1, -2) - 2.0 * ab
    return jnp.maximum(d, 0.0)


def knn(points: jax.Array, k: int, queries: jax.Array | None = None) -> jax.Array:
    """Exact brute-force kNN indices (ascending distance, self first for
    self-kNN) — the on-device replacement for Faiss IndexFlatL2
    (data/modelnet_shrec_loader.py:140-150).

    points: (..., M, C); queries: (..., Q, C) or None for self-kNN.
    Returns int32 indices (..., Q, k).
    """
    q = points if queries is None else queries
    d = pairwise_sqdist(q, points)
    if queries is None:
        # Pin the diagonal below zero: the matmul-form distance makes the
        # self-distance only approximately 0, but Faiss (exact L2) always
        # returns self first — parity for KNNModule's neighbor gather.
        M = points.shape[-2]
        eye = jnp.eye(M, dtype=bool)
        d = jnp.where(eye, -1.0, d)
    _, idx = jax.lax.top_k(-d, k)  # ascending distance; ties broken by index
    return idx.astype(jnp.int32)


class TopKAssign(NamedTuple):
    """Result of assigning every point to its top-k nearest SOM nodes.

    With N points and grouping factor k, "stacked" arrays have length
    kN where block ``i*N:(i+1)*N`` is the i-th nearest assignment — the
    same ordering the reference builds by concatenating per-k slices
    (util/som.py:261-266).
    """

    min_idx: jax.Array      # (B, kN) int32 — assigned node id per stacked point
    mask_row_max: jax.Array  # (B, M) bool — node has at least one point
    sqdist: jax.Array        # (B, kN) f32 — squared distance to assigned node


def assign_topk(x: jax.Array, nodes: jax.Array, k: int) -> TopKAssign:
    """Top-k point->node assignment (reference util/som.py:237-269).

    x: (B, N, C) points; nodes: (B, M, C) SOM nodes.
    """
    B, N, _ = x.shape
    M = nodes.shape[-2]
    d = pairwise_sqdist(x, nodes)  # (B, N, M)
    neg_top, idx = jax.lax.top_k(-d, k)  # (B, N, k) ascending distance
    # stack k-major: (B, k, N) -> (B, kN)
    min_idx = jnp.transpose(idx, (0, 2, 1)).reshape(B, k * N).astype(jnp.int32)
    sq = jnp.transpose(-neg_top, (0, 2, 1)).reshape(B, k * N)
    # node occupancy via one-hot reduce (scatter is slow on TPU; callers
    # that build the one-hot anyway get this CSE'd for free)
    counts = jnp.sum(jax.nn.one_hot(min_idx, M, dtype=jnp.float32), axis=1)
    return TopKAssign(min_idx=min_idx, mask_row_max=counts > 0, sqdist=sq)


def one_hot_f32(idx: jax.Array, num: int) -> jax.Array:
    """One-hot in f32 — the ``mask`` of util/som.py:258-265, used as a
    matmul operand for segment-sum / center lookup on the MXU."""
    return jax.nn.one_hot(idx, num, dtype=jnp.float32)
