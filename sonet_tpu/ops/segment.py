"""Node pooling: batched segment max / sum / mean over SOM-node ids.

This is the TPU-native replacement for the reference's only custom CUDA
kernel, ``index_max`` (models/index_max_ext/index_max_cuda.cu:66-100,
index_max.cpp:33-112): given per-point features and a node id per point,
reduce features per node.

Empty-node semantics (parity-critical, SURVEY.md §7): the reference
gathers with ``gather_index * mask_row_max`` so an empty node reads the
feature of stacked point 0 (networks.py:185), and the gradient of that
gather flows to point 0.  ``segment_max`` reproduces both.

Implementation notes (measured on v5e at B=8, kN=15000, M=64, C=384):

* forward — ``jax.ops.segment_max`` (scatter-max) at ~2.2 ms.  The naive
  "one-hot + where + max-reduce" form costs 11 ms because XLA does not
  fuse the (B, N, M, C) broadcast well; an associative-scan segmented max
  costs 8 ms; a windowed Pallas kernel 4.3 ms (kept in ``ops.pallas`` as
  the reference-parity argmax kernel and cross-check).
* backward — XLA's scatter-max VJP costs ~58 ms (serialized scatter), so
  ``segment_max`` carries a custom VJP that routes gradients through a
  winner-equality mask with one-hot *matmuls* (MXU) instead of gathers:
  ~1.5 ms.  On exact float ties the gradient is split equally among
  winners (sum-preserving); the reference sends it all to the first
  winner — ties only arise for bit-identical activations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def segment_counts(seg_ids: jax.Array, num_segments: int) -> jax.Array:
    """(B, N) int ids -> (B, M) counts (one-hot reduce; no scatter)."""
    onehot = jax.nn.one_hot(seg_ids, num_segments, dtype=jnp.float32)
    return jnp.sum(onehot, axis=1).astype(jnp.int32)


def _empty_patch(out: jax.Array, data: jax.Array,
                 counts: jax.Array) -> jax.Array:
    """empty node -> feature of point 0 (networks.py:185 semantics)."""
    point0 = data[..., 0:1, :]
    empty = (counts == 0)[..., None]
    return jnp.where(empty, point0, out)


# ---------------------------------------------------------------------------
# default segment_max: scatter forward + matmul-routed custom backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_max(data: jax.Array, seg_ids: jax.Array,
                num_segments: int) -> jax.Array:
    """data (B, N, C), seg_ids (B, N) int -> (B, M, C)."""
    return _fwd(data, seg_ids, num_segments)[0]


def _fwd(data, seg_ids, num_segments):
    M = num_segments
    seg_ids = seg_ids.astype(jnp.int32)
    out = jax.vmap(
        functools.partial(jax.ops.segment_max, num_segments=M))(data,
                                                                seg_ids)
    counts = segment_counts(seg_ids, M)
    out = jnp.where((counts == 0)[..., None], 0.0, out)  # clear -inf
    out = _empty_patch(out, data, counts)
    return out, (data, seg_ids, out, counts)


def route_max_grad(data, seg_ids, out, counts, g, point0_idx=None):
    """Matmul-routed VJP of a segment max: route each output cotangent
    back to the winning point(s) through a winner-equality mask.

    ``point0_idx`` names the per-batch position that received the
    empty-segment forward value (default 0 — the sorted pipeline passes
    the sorted position of original stacked point 0 for parity with
    networks.py:185).  Shared by ``segment_max`` and the Pallas-forward
    ``segment_max_fast`` (ops/segment_fast.py).
    """
    M = out.shape[1]
    ids3 = seg_ids[..., None]
    bf16 = data.dtype == jnp.bfloat16
    onehot = jax.nn.one_hot(seg_ids, M,
                            dtype=jnp.bfloat16 if bf16 else jnp.float32)
    # winner mask: exact value comparison against the segment's max.
    # bf16 data: route via one-hot matmul — exact (one-hot rows have a
    # single 1.0; bf16 values pass through the bf16 MXU unchanged) and
    # ~10x faster than the row gather.  f32 data: gather (matmul at MXU
    # precision would not be bit-exact and would break the equality).
    if bf16:
        out_pp = jnp.einsum("bnm,bmc->bnc", onehot,
                            out.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)
    else:
        out_pp = jnp.take_along_axis(out, ids3, axis=1)     # (B, N, C)
    # winner mask in the compute dtype: 0/1 entries are exact in bf16,
    # halving the (B, N, C) traffic of both consumers below
    eq = (data == out_pp).astype(jnp.bfloat16 if bf16 else jnp.float32)
    # tie counts per (segment, channel); rounded so the division is exact
    # (inputs are exact in bf16; accumulation is f32)
    ties = jnp.round(jnp.einsum("bnm,bnc->bmc", onehot, eq,
                                preferred_element_type=jnp.float32))
    empty = (counts == 0)[..., None]                        # (B, M, 1)
    g = g.astype(jnp.float32)
    g_eff = jnp.where(empty, 0.0, g)
    # divide by tie count PER SEGMENT before routing: one (B, N, C)
    # einsum instead of two (identical values — both lookups route the
    # same per-(segment, channel) row; saves a ~184MB f32 materialization
    # at flagship shapes).  Routing rides the MXU: gathers from a
    # (B, M, C) table are ~10x slower than these one-hot matmuls.
    ratio = g_eff / jnp.maximum(ties, 1.0)                  # (B, M, C)
    # bf16 data: the routed output IS the (already bf16) ratio passing
    # through a single 1.0 per row — bf16 output is exact and halves the
    # (B, N, C) write vs a f32 accumulator dump
    ratio_pp = jnp.einsum("bnm,bmc->bnc", onehot,
                          ratio.astype(jnp.bfloat16) if bf16 else ratio,
                          preferred_element_type=(jnp.bfloat16 if bf16
                                                  else jnp.float32),
                          precision=None if bf16 else _HI)
    grad = eq * ratio_pp
    # empty segments forwarded the point0 feature: gradient routed there
    g_empty = jnp.sum(jnp.where(empty, g, 0.0), axis=1)     # (B, C)
    g_empty = g_empty.astype(grad.dtype)
    if point0_idx is None:
        grad = grad.at[:, 0, :].add(g_empty)
    else:
        grad = grad.at[jnp.arange(data.shape[0]), point0_idx, :].add(g_empty)
    return grad.astype(data.dtype)


def _bwd(num_segments, res, g):
    data, seg_ids, out, counts = res
    grad = route_max_grad(data, seg_ids, out, counts, g)
    return (grad, jnp.zeros(seg_ids.shape, jax.dtypes.float0))


segment_max.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# named variants (cross-check oracles; see tests/test_kernels.py)
# ---------------------------------------------------------------------------

def segment_max_scatter(data: jax.Array, seg_ids: jax.Array,
                        num_segments: int,
                        counts: jax.Array | None = None) -> jax.Array:
    """jax.ops.segment_max vmapped over batch, XLA autodiff (slow bwd)."""
    seg_ids = seg_ids.astype(jnp.int32)
    if counts is None:
        counts = segment_counts(seg_ids, num_segments)
    out = jax.vmap(
        functools.partial(jax.ops.segment_max, num_segments=num_segments)
    )(data, seg_ids)
    out = jnp.where((counts == 0)[..., None], 0.0, out)
    return _empty_patch(out, data, counts)


def segment_max_onehot(data: jax.Array, seg_ids: jax.Array,
                       num_segments: int,
                       counts: jax.Array | None = None,
                       block_m: int = 16) -> jax.Array:
    """Masked-broadcast max, blocked over segments (reference formulation;
    kept as a differentiable oracle — slow on TPU, see module docstring)."""
    B, N, C = data.shape
    M = num_segments
    if counts is None:
        counts = segment_counts(seg_ids, M)
    ids = seg_ids[:, :, None]

    def one_block(m0):
        mids = m0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_m), 2)
        mask = ids == mids
        masked = jnp.where(mask[..., None], data[:, :, None, :], -1e10)
        return jnp.max(masked, axis=1)

    nblocks = -(-M // block_m)
    M_pad = nblocks * block_m
    starts = jnp.arange(nblocks, dtype=jnp.int32) * block_m
    blocks = jax.lax.map(one_block, starts)
    out = jnp.transpose(blocks, (1, 0, 2, 3)).reshape(B, M_pad, C)[:, :M]
    return _empty_patch(out, data, counts)


# ---------------------------------------------------------------------------
# segment sum / mean (MXU one-hot matmuls)
# ---------------------------------------------------------------------------

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
    cnt = jnp.sum(onehot, axis=-2)[..., None]
    return s / (cnt + eps)
