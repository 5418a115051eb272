"""Pallas TPU kernel: windowed segment max for (near-)sorted segment ids.

Second-generation node-pooling kernel (see segment_argmax.py for the
argmax/reference-parity variant).  Instead of looping node-by-node with
per-row writes, each point chunk is reduced against a W-wide window of
node ids in one vectorized (Nc, W, Cb) masked max, and the (W, Cb)
result is combined into the output block with a single dynamic-slice
update.  For ids sorted along the point axis the id span per chunk is
~M*Nc/N, so one or two windows cover a chunk; unsorted input remains
correct via more window iterations (span widens to M).

Forward only — pair with the matmul-routed equality VJP in
``ops.segment`` for gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38


def _make_kernel(num_segments: int, window: int, block_n: int,
                 n_true: int | None):
    M, W = num_segments, window
    # python float literal: weak-typed, follows data dtype (f32 in-kernel)
    neg = _NEG

    def kernel(idx_ref, data_ref, val_ref):
        n = pl.program_id(2)

        @pl.when(n == 0)
        def _init():
            val_ref[...] = jnp.full_like(val_ref, _NEG)

        ids = idx_ref[0]            # (1, Nc) int32 — lane-contiguous
        # block of the (B, 1, N) ids array.  Feeding ids as (B, N, 1)
        # forced XLA to materialize a sublane relayout copy of the
        # whole array (copy.28, 0.75 ms of the B=64 inference step:
        # each id landed in its own 8x128 tile row); the (B, 1, N)
        # shape keeps ids lane-packed (the reshape is a cheap retile)
        # and the compare below works row-major, no transpose.
        # upcast AFTER the DMA: bf16 input halves HBM->VMEM traffic while
        # the VPU mask/max work runs in f32 (Mosaic relayout limitations
        # block bf16 minor-dim broadcasts; the in-VMEM convert is cheap)
        data = data_ref[0].astype(jnp.float32)   # (Nc, Cb)
        if n_true is not None:
            # ragged point axis: rows >= n_true in the LAST chunk are
            # out-of-bounds DMA garbage.  Masking them here (ids -> 0,
            # data -> -inf, a no-op for the max) replaces an HBM-level
            # jnp.pad of the whole (B, N, C) stack — that pad was
            # 2.28 ms of the 17 ms B=64 inference step (VERDICT r4 #8).
            col = n * block_n + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_n), 1)      # (1, Nc)
            ids = jnp.where(col < n_true, ids, 0)
            row = n * block_n + jax.lax.broadcasted_iota(
                jnp.int32, (block_n, 1), 0)      # (Nc, 1)
            data = jnp.where(row < n_true, data, neg)
        lo = jnp.minimum(jnp.min(ids), M - 1)
        hi = jnp.minimum(jnp.max(ids), M - 1)
        # W-grid-aligned windows: `base` is provably a multiple of W, so
        # the dynamic-slice write satisfies the sublane alignment rule
        # (bf16 needs 16-row tiles)
        w0 = lo // W
        n_win = hi // W - w0 + 1

        w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)  # (W, 1)

        def body(i, _):
            base = pl.multiple_of((w0 + i) * W, W)
            # f32 mask: Mosaic only supports minor-dim insertion on
            # 32-bit types (i1 [:, :, None] fails to compile)
            ohf = ((ids - base) == w_iota).astype(jnp.float32)  # (W, Nc)
            masked = jnp.where(ohf[:, :, None] > 0.0,
                               data[None, :, :], neg)
            wmax = jnp.max(masked, axis=1)           # (W, Cb)
            prev = val_ref[0, pl.ds(base, W), :]
            val_ref[0, pl.ds(base, W), :] = jnp.maximum(prev, wmax)
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)

    return kernel


def windowed_vals(data: jax.Array, seg_ids: jax.Array,
                  num_segments: int, window: int = 16,
                  block_n: int = 512, block_c: int = 128,
                  interpret: bool | None = None) -> jax.Array:
    """Raw kernel output: f32 (B, M, C) per-segment maxima with empty
    segments left at -3e38 (callers patch empties; see
    ``segment_max_windowed`` / ``ops.segment_fast``)."""
    B, N, C = data.shape
    M = num_segments
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # sublane alignment: window rows must be a tile multiple of the f32
    # accumulator (the kernel computes in f32 regardless of input dtype)
    min_w = 8
    window = max(min(window, M), min(min_w, M))
    if not interpret:
        window = max(window, min_w)
    block_n = min(block_n, N)
    block_c = min(block_c, max(C, 1))
    M_pad = -(-M // window) * window

    # input stays in its dtype (bf16 halves the dominant HBM->VMEM DMA);
    # the kernel upcasts in VMEM and accumulates in f32
    dat = jax.lax.stop_gradient(data)
    if dat.dtype not in (jnp.float32, jnp.bfloat16):
        dat = dat.astype(jnp.float32)
    ids = jax.lax.stop_gradient(seg_ids).astype(jnp.int32)
    # point axis NOT padded: a ragged last chunk is masked in-kernel
    # (see _make_kernel) — an HBM jnp.pad of the (B, N, C) stack costs
    # real bandwidth (~1.5 GB of traffic at B=64, N=15000, C=384)
    n_pad = (-N) % block_n
    c_pad = (-C) % block_c
    if c_pad:
        dat = jnp.pad(dat, ((0, 0), (0, 0), (0, c_pad)))
    Np, Cp = dat.shape[1], dat.shape[2]

    vals = pl.pallas_call(
        _make_kernel(M_pad, window, block_n, N if n_pad else None),
        grid=(B, Cp // block_c, -(-Np // block_n)),
        in_specs=[
            pl.BlockSpec((1, 1, block_n), lambda b, c, n: (b, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n, block_c), lambda b, c, n: (b, n, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M_pad, block_c),
                               lambda b, c, n: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M_pad, Cp), jnp.float32),
        interpret=interpret,
    )(ids[:, None, :], dat)[:, :M, :C]
    return vals


@functools.partial(jax.jit, static_argnames=("num_segments", "window",
                                             "block_n", "block_c",
                                             "interpret"))
def segment_max_windowed(data: jax.Array, seg_ids: jax.Array,
                         num_segments: int, window: int = 16,
                         block_n: int = 512, block_c: int = 128,
                         interpret: bool | None = None,
                         counts: jax.Array | None = None) -> jax.Array:
    """Segment max values (B, M, C); empty segments -> data[:, 0, :].

    data (B, N, C) f32/bf16; seg_ids (B, N) int32 (sorted = fast).
    ``counts`` (B, M) may be passed in to avoid rebuilding the one-hot
    occupancy reduce when the caller already has it.
    """
    M = num_segments
    C = data.shape[-1]
    # forward-only: gradients come exclusively from segment_max_fast's
    # custom VJP (ops/segment_fast.py).  Without this, autodiff would
    # error inside pallas_call anyway, but the empty-patch read below
    # must not look differentiable either.
    data = jax.lax.stop_gradient(data)
    vals = windowed_vals(data, seg_ids, M, window, block_n, block_c,
                         interpret)
    # empty segments: -inf -> feature of point 0 (networks.py:185 parity)
    if counts is None:
        counts = jnp.sum(jax.nn.one_hot(seg_ids, M, dtype=jnp.float32),
                         axis=1)
    empty = (counts == 0)[..., None]
    vals = jnp.where(empty, data[:, 0:1, :C].astype(jnp.float32), vals)
    return vals.astype(data.dtype)
