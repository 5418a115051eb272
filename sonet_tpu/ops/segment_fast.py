"""Production node pooling: Pallas windowed forward + matmul-routed VJP.

``segment_max_fast`` is the sorted-pipeline replacement for the
reference's ``index_max`` CUDA kernel + gather (models/index_max_ext/
index_max_cuda.cu:66-100, networks.py:181-185): the encoder argsorts the
stacked points by assigned node once per forward, the windowed Pallas
kernel (ops/pallas/segment_max_window.py) reduces each point chunk
against a narrow window of node rows (bf16 input halves the dominant
HBM DMA), and gradients route through the winner-equality mask on the
MXU (ops/segment.py:route_max_grad).

Empty-node parity: the reference forwards the feature of ORIGINAL
stacked point 0 to empty nodes (gather_index * mask_row_max,
networks.py:185).  In sorted order that point sits at position
``point0_idx = inv_perm[:, 0]``; both the forward patch and the
empty-gradient routing honor it.

Mesh support: ``pallas_call`` has no GSPMD partitioning rules, so under
a >1-device mesh the kernel runs per shard inside ``jax.shard_map``
(batch sharded over the mesh's first axis, points over the second).
Segment max is associative, so each points-shard reduces its local
slice to (B_loc, M, C) partials (empties at -3e38) and a cross-shard
``lax.pmax`` over the points axis combines them; the empty patch and
the matmul-routed VJP stay outside in plain GSPMD-land.  This keeps the
flagship kernel live in the flagship multi-chip configuration instead
of downgrading to the ~4x slower scatter path (VERDICT r2 #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .segment import route_max_grad, segment_counts
from .pallas.segment_max_window import windowed_vals


def windowed_vals_sharded(data, seg_ids, num_segments, mesh,
                          window=8, block_n=512, block_c=512):
    """Raw windowed-kernel output under a device mesh: ``windowed_vals``
    per shard + ``pmax`` over the points axis.  (B, M, C) f32 with empty
    segments at -3e38, replicated along the points axis."""
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names
    d_ax = axes[0]
    p_ax = axes[1] if len(axes) > 1 else None
    B, N = seg_ids.shape
    d_size = mesh.shape[d_ax]
    p_size = mesh.shape[p_ax] if p_ax is not None else 1
    if B % d_size or N % p_size:
        raise ValueError(
            f"segment_max_fast under mesh {dict(mesh.shape)}: batch {B} "
            f"must divide over '{d_ax}' ({d_size}) and stacked points "
            f"{N} over '{p_ax}' ({p_size})")

    def local(d, i):
        v = windowed_vals(d, i, num_segments, window=window,
                          block_n=block_n, block_c=block_c)
        if p_ax is not None and p_size > 1:
            v = jax.lax.pmax(v, p_ax)
        return v

    # check_vma=False: pallas_call can't declare varying-mesh-axes on its
    # outputs; replication along the points axis is guaranteed by the
    # pmax above (and pinned by tests vs the scatter oracle)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(d_ax, p_ax, None), P(d_ax, p_ax)),
        out_specs=P(d_ax, None, None), check_vma=False)(data, seg_ids)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _segmax_fast(data, seg_ids, counts, point0_idx,
                 num_segments, window, block_n, block_c, mesh):
    out, _ = _fast_fwd(data, seg_ids, counts, point0_idx,
                       num_segments, window, block_n, block_c, mesh)
    return out


def _fast_fwd(data, seg_ids, counts, point0_idx,
              num_segments, window, block_n, block_c, mesh):
    if mesh is not None and mesh.size > 1:
        vals = windowed_vals_sharded(data, seg_ids, num_segments, mesh,
                                     window=window, block_n=block_n,
                                     block_c=block_c)
    else:
        vals = windowed_vals(data, seg_ids, num_segments,
                             window=window, block_n=block_n,
                             block_c=block_c)
    empty = (counts == 0)[..., None]                     # (B, M, 1)
    if point0_idx is None:
        p0 = data[:, 0:1, :]
    else:
        p0 = jnp.take_along_axis(data, point0_idx[:, None, None], axis=1)
    out = jnp.where(empty, p0.astype(jnp.float32), vals).astype(data.dtype)
    return out, (data, seg_ids, counts, point0_idx, out)


def _fast_bwd(num_segments, window, block_n, block_c, mesh, res, g):
    data, seg_ids, counts, point0_idx, out = res
    grad = route_max_grad(data, seg_ids, out, counts, g,
                          point0_idx=point0_idx)
    zero_ids = jnp.zeros(seg_ids.shape, jax.dtypes.float0)
    zero_cnt = jnp.zeros_like(counts)
    zero_p0 = (None if point0_idx is None
               else jnp.zeros(point0_idx.shape, jax.dtypes.float0))
    return grad, zero_ids, zero_cnt, zero_p0


_segmax_fast.defvjp(_fast_fwd, _fast_bwd)


def segment_max_fast(data: jax.Array, seg_ids: jax.Array,
                     num_segments: int, *,
                     counts: jax.Array | None = None,
                     point0_idx: jax.Array | None = None,
                     window: int = 8, block_n: int = 512,
                     block_c: int | None = None,
                     mesh=None) -> jax.Array:
    """Segment max (B, N, C) x (B, N) -> (B, M, C), Pallas forward.

    Fastest when ``seg_ids`` are sorted ascending per batch (the kernel
    is correct for unsorted ids, just does more window iterations).
    Defaults measured on v5e at (8, 15000, 384), M=64 sorted: 0.62 ms
    vs 2.10 ms scatter (c-axis blocking was pure overhead — full channel
    width per chunk is 3.5x faster than block_c=128).
    ``counts``: optional precomputed (B, M) occupancy; ``point0_idx``:
    optional per-batch position whose feature empty segments forward
    (default position 0).  ``mesh``: a >1-device ``jax.sharding.Mesh``
    runs the kernel per shard under shard_map (see module docstring);
    block sizes apply per shard.
    """
    if counts is None:
        counts = segment_counts(seg_ids, num_segments)
    if block_c is None:
        block_c = min(data.shape[-1], 512)
    return _segmax_fast(data, seg_ids, counts, point0_idx,
                        num_segments, window, block_n, block_c, mesh)
