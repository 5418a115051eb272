"""Index-gather ops (channel-last reworks of models/operations.py:19-54
and the node->point skip gathers of models/segmenter.py:89-98)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_gather(data: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighbor features by index.

    data: (B, M, C); idx: (B, Q, K) int -> (B, Q, K, C).
    Reference: knn_gather_by_indexing / knn_gather_wrapper
    (models/operations.py:19-54), which assert C in {2,3} for coords; this
    version is shape-generic (it serves both coordinate and feature gathers).
    """
    B, Q, K = idx.shape
    return jnp.take_along_axis(
        data[:, None, :, :],                      # (B, 1, M, C)
        idx[..., None].astype(jnp.int32),          # (B, Q, K, 1)
        axis=2,
    )


@jax.custom_vjp
def permute_points(x: jax.Array, perm: jax.Array,
                   inv: jax.Array) -> jax.Array:
    """Reorder the point axis by a known bijection: ``y[:, i] = x[:, perm[i]]``.

    ``inv`` must be the inverse permutation (``perm[inv[j]] == j``).  The
    VJP is the inverse *gather* — XLA cannot know gather indices form a
    permutation and would otherwise transpose this into a serialized
    scatter-add (~2 ms at (8, 15000, C) on v5e, the exact scatter floor
    the sorted encoder pipeline removes).

    x: (B, N, C); perm/inv: (B, N) int32 -> (B, N, C).
    """
    return jnp.take_along_axis(x, perm[..., None].astype(jnp.int32), axis=1)


def _permute_fwd(x, perm, inv):
    return permute_points(x, perm, inv), (perm, inv)


def _permute_bwd(res, g):
    perm, inv = res
    gx = jnp.take_along_axis(g, inv[..., None].astype(jnp.int32), axis=1)
    return (gx,
            jnp.zeros(perm.shape, jax.dtypes.float0),
            jnp.zeros(inv.shape, jax.dtypes.float0))


permute_points.defvjp(_permute_fwd, _permute_bwd)


def gather_by_segment(node_feat: jax.Array, seg_ids: jax.Array,
                      onehot: jax.Array | None = None) -> jax.Array:
    """Broadcast per-node features back to points: the segmenter's skip
    gathers (segmenter.py:89-98, where ``mask_max_idx`` == the assignment
    index because argmax of a one-hot row is the assigned node).

    node_feat: (B, M, C); seg_ids: (B, N) int -> (B, N, C).

    When the caller already holds the assignment one-hot (B, N, M) —
    the encoder builds it anyway — the gather routes as a one-hot
    matmul on the MXU instead: row-gathers from small tables run ~10x
    slower on v5e and their backward transposes into a serialized
    scatter-add.  Exact for bf16 tables (a single 1.0 per row); ~1e-7
    for f32 tables at HIGHEST precision.
    """
    if onehot is None:
        return jnp.take_along_axis(
            node_feat, seg_ids[..., None].astype(jnp.int32), axis=1)
    bf16 = onehot.dtype == jnp.bfloat16
    table = node_feat.astype(jnp.bfloat16) if bf16 else node_feat
    return jnp.einsum(
        "bnm,bmc->bnc", onehot, table,
        preferred_element_type=(jnp.bfloat16 if bf16 else jnp.float32),
        precision=None if bf16 else jax.lax.Precision.HIGHEST)
