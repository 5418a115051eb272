"""Pallas TPU kernel: fused segment argmax (node pooling).

This is the TPU rebirth of the reference's only custom CUDA kernel,
``index_max`` (models/index_max_ext/index_max_cuda.cu:66-100): for
per-point features and a node id per point, find the argmax point per
(node, channel).  Returning the *index* (not the value) makes the
backward pass a tiny (M x C) scatter-add through XLA's gather gradient —
the same trick the reference used for PyTorch autograd
(networks.py:182-185) turns out to be right on TPU too: XLA's general
segment scatter-max lowers to ~2ms forward / ~10ms backward at SO-Net
shapes (B=8, kN=15000, C=384), while argmax-kernel + gather is ~100x
cheaper on the backward.

The kernel walks the point axis in VMEM-resident chunks and loops only
over the node-id span present in each chunk, so when points are sorted
by node id (the encoder sorts once per forward; sorting a (B, 15000)
int array is ~free) the per-chunk span is ~M*Nc/N instead of M — about
an order of magnitude less VPU work.  Unsorted input stays correct (the
span just widens to M).

API: ``segment_argmax(data (B,N,C), seg_ids (B,N) int32, M) ->
argmax (B,M,C) int32``, empty segments -> index 0 (reference parity:
networks.py:185 gathers index 0 for empty nodes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # below any finite f32


def _make_kernel(num_segments: int):
    M = num_segments

    def kernel(idx_ref, data_ref, out_idx_ref, val_ref):
        n = pl.program_id(2)

        @pl.when(n == 0)
        def _init():
            val_ref[...] = jnp.full_like(val_ref, _NEG)
            out_idx_ref[...] = jnp.zeros_like(out_idx_ref)

        ids = idx_ref[0]             # (Nc, 1) int32
        data = data_ref[0]           # (Nc, Cb) f32
        Nc = data.shape[0]
        base = n * Nc

        # node-id span present in this chunk (clamped away from the
        # out-of-range padding id M)
        lo = jnp.minimum(jnp.min(ids), M - 1)
        hi = jnp.minimum(jnp.max(ids), M - 1)

        rel = jax.lax.broadcasted_iota(jnp.int32, (Nc, 1), 0)

        def body(m, _):
            mask = ids == m                               # (Nc, 1)
            masked = jnp.where(mask, data, _NEG)          # (Nc, Cb)
            cmax = jnp.max(masked, axis=0, keepdims=True)  # (1, Cb)
            # first-max-wins argmax (parity with the reference kernel's
            # strict '>' scan, index_max_cuda.cu:15-25)
            is_max = masked == cmax
            pos = jnp.where(is_max, rel, Nc)              # (Nc, Cb)
            cargmax = jnp.min(pos, axis=0, keepdims=True) + base  # (1, Cb)
            prev_val = val_ref[0, pl.ds(m, 1), :]         # (1, Cb)
            prev_idx = out_idx_ref[0, pl.ds(m, 1), :]
            better = cmax > prev_val
            val_ref[0, pl.ds(m, 1), :] = jnp.where(better, cmax, prev_val)
            out_idx_ref[0, pl.ds(m, 1), :] = jnp.where(better, cargmax,
                                                       prev_idx)
            return 0

        jax.lax.fori_loop(lo, hi + 1, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_segments", "block_n",
                                             "block_c", "interpret"))
def segment_argmax(data: jax.Array, seg_ids: jax.Array, num_segments: int,
                   block_n: int = 1024, block_c: int = 128,
                   interpret: bool | None = None) -> jax.Array:
    """argmax point index per (segment, channel); empty segments -> 0.

    data: (B, N, C) float; seg_ids: (B, N) int32.  Fast when seg_ids is
    sorted along N (correct either way)."""
    B, N, C = data.shape
    M = num_segments
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_n = min(block_n, N)
    block_c = min(block_c, max(C, 1))
    n_pad = (-N) % block_n
    c_pad = (-C) % block_c
    # the kernel is non-differentiable (integer output); block JVP tracing
    data = jax.lax.stop_gradient(data).astype(jnp.float32)
    seg_ids = jax.lax.stop_gradient(seg_ids).astype(jnp.int32)
    if n_pad:
        data = jnp.pad(data, ((0, 0), (0, n_pad), (0, 0)))
        # padded points get the out-of-range id M: excluded from all
        # real segments by the span clamp + equality mask
        seg_ids = jnp.pad(seg_ids, ((0, 0), (0, n_pad)), constant_values=M)
    if c_pad:
        data = jnp.pad(data, ((0, 0), (0, 0), (0, c_pad)))
    Np, Cp = data.shape[1], data.shape[2]

    out_idx, _vals = pl.pallas_call(
        _make_kernel(M),
        grid=(B, Cp // block_c, Np // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, 1), lambda b, c, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, block_c), lambda b, c, n: (b, n, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M, block_c), lambda b, c, n: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, block_c), lambda b, c, n: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, Cp), jnp.int32),
            jax.ShapeDtypeStruct((B, M, Cp), jnp.float32),
        ],
        interpret=interpret,
    )(seg_ids[..., None], data)
    return out_idx[:, :, :C]


def segment_max_pallas(data: jax.Array, seg_ids: jax.Array,
                       num_segments: int, **kw) -> jax.Array:
    """Value variant, differentiable via gather: backward is a tiny
    (M x C) scatter-add instead of a full segment scatter."""
    idx = jax.lax.stop_gradient(
        segment_argmax(data, seg_ids, num_segments, **kw))
    return jnp.take_along_axis(data, idx, axis=1)
