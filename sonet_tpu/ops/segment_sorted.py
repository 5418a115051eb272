"""Sorted-segment max: scatter-free node pooling for sorted segment ids.

The encoder sorts stacked points by assigned node once per forward (an
argsort of a (B, kN) int array is ~free on TPU); with sorted ids the
segment max becomes

* forward — a segmented max `associative_scan` along the point axis plus
  a gather at each segment's last position (found by `searchsorted`);
* backward — a custom VJP that routes each output gradient back through
  an equality mask: no scatter at all, just two gathers, one compare and
  one one-hot matmul for tie counting.

Exactness notes vs the reference index_max+gather (networks.py:181-185):
values and empty-node semantics (empty -> feature of point 0, with
gradient routed to point 0) match exactly; on exact float ties the
reference sends the whole gradient to the first maximal point while this
backward splits it equally among the tied points (sum-preserving — ties
only arise for bit-identical activations, e.g. duplicated points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _segmented_scan_max(ids: jax.Array, vals: jax.Array) -> jax.Array:
    """Inclusive segmented running max along axis 1 for sorted ids.

    ids: (B, N) int32; vals: (B, N, C) -> (B, N, C).
    """
    def combine(a, b):
        a_id, a_val = a
        b_id, b_val = b
        same = a_id == b_id  # (..., 1) broadcasts over channels
        return b_id, jnp.where(same, jnp.maximum(a_val, b_val), b_val)

    _, scanned = jax.lax.associative_scan(
        combine, (ids[..., None], vals), axis=1)
    return scanned


def _segment_ends(ids: jax.Array, num_segments: int) -> jax.Array:
    """Per-batch index of each segment's last element (sorted ids).

    Returns (B, M) int32; for empty segments end[m] == end of the
    previous nonempty segment (unused — callers gate on counts)."""
    def one(a):
        return jnp.searchsorted(a, jnp.arange(num_segments), side="right")
    return (jax.vmap(one)(ids) - 1).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_max_sorted(data: jax.Array, seg_ids: jax.Array,
                       num_segments: int) -> jax.Array:
    """Segment max over sorted seg_ids; empty segments -> data[:, 0, :].

    data: (B, N, C); seg_ids: (B, N) int32 SORTED ascending per batch.
    """
    out, _ = _fwd(data, seg_ids, num_segments)
    return out


def _fwd(data, seg_ids, num_segments):
    M = num_segments
    scanned = _segmented_scan_max(seg_ids, data)        # (B, N, C)
    ends = _segment_ends(seg_ids, M)                    # (B, M)
    gathered = jnp.take_along_axis(
        scanned, jnp.maximum(ends, 0)[..., None], axis=1)  # (B, M, C)
    counts = jax.vmap(
        lambda a: jnp.searchsorted(a, jnp.arange(M), side="right")
        - jnp.searchsorted(a, jnp.arange(M), side="left"))(seg_ids)
    empty = (counts == 0)[..., None]                    # (B, M, 1)
    out = jnp.where(empty, data[:, 0:1, :], gathered)
    return out, (data, seg_ids, out, empty)


def _bwd(num_segments, res, g):
    data, seg_ids, out, empty = res
    M = num_segments
    ids3 = seg_ids[..., None].astype(jnp.int32)          # (B, N, 1)
    # route each point its segment's output + gradient
    out_pp = jnp.take_along_axis(out, ids3, axis=1)      # (B, N, C)
    g_eff = jnp.where(empty, 0.0, g)                     # empty handled below
    g_pp = jnp.take_along_axis(g_eff, ids3, axis=1)      # (B, N, C)
    eq = (data == out_pp).astype(data.dtype)             # winners mask
    # tie counts per (segment, channel) via one-hot matmul (MXU)
    onehot = jax.nn.one_hot(seg_ids, M, dtype=data.dtype)  # (B, N, M)
    ties = jnp.einsum("bnm,bnc->bmc", onehot, eq,
                      preferred_element_type=jnp.float32)  # (B, M, C)
    ties_pp = jnp.take_along_axis(ties, ids3, axis=1)
    grad = g_pp * eq / jnp.maximum(ties_pp, 1.0)
    # empty segments: forward value was data[:, 0, :] -> gradient to point 0
    g_empty = jnp.sum(jnp.where(empty, g, 0.0), axis=1)  # (B, C)
    grad = grad.at[:, 0, :].add(g_empty.astype(grad.dtype))
    return grad, jnp.zeros(seg_ids.shape, jax.dtypes.float0)


segment_max_sorted.defvjp(_fwd, _bwd)


def sort_by_segment(seg_ids: jax.Array, *arrays):
    """Stable-sort (B, N) ids; returns (sorted_ids, perm, inv_perm,
    sorted arrays...).  perm/inv_perm are (B, N) int32 gather maps.

    Uses two ``lax.sort_key_val`` passes (sort, then sort the
    permutation to invert it) — measured 3.5x cheaper on v5e than the
    equivalent argsort+argsort (0.34 ms vs 1.2 ms at (8, 15000))."""
    B, N = seg_ids.shape
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    sorted_ids, perm = jax.lax.sort_key_val(seg_ids, iota, dimension=1)
    _, inv = jax.lax.sort_key_val(perm, iota, dimension=1)
    out = [jnp.take_along_axis(a, perm[..., None], axis=1) for a in arrays]
    return (sorted_ids, perm, inv, *out)
