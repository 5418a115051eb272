"""On-device bidirectional Chamfer loss.

Replaces the reference ChamferLoss (models/losses.py:192-296), which
round-trips every training step through the host to build per-batch-item
Faiss GPU indexes (losses.py:247-276).  Here the N x N' pairwise problem
(<= 5000 x 1280) is one batched MXU matmul + argmin, fully inside jit.

Gradient semantics match the reference: the 1-NN *selection* is
non-differentiable (integer argmin), gradients flow through the selected
pairs via ``robust_norm`` (losses.py:17-27): sqrt(sum_sq + 1e-8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pairwise import pairwise_sqdist


def robust_norm(diff: jax.Array, eps: float = 1e-8) -> jax.Array:
    """sqrt(sum_c diff^2 + eps) over the channel axis (losses.py:17-27)."""
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1) + eps)


class ChamferResult(NamedTuple):
    loss: jax.Array           # scalar: forward + backward mean
    forward_loss: jax.Array   # scalar: mean over predict->gt matches
    backward_loss: jax.Array  # scalar: mean over gt->predict matches
    loss_array: jax.Array     # (B,) per-item fwd+bwd means (losses.py:289)
    forward_array: jax.Array  # (B,) per-item forward means
    backward_array: jax.Array  # (B,) per-item backward means


def chamfer(predict_pc: jax.Array, gt_pc: jax.Array) -> ChamferResult:
    """Bidirectional 1-NN Chamfer distance.

    predict_pc: (B, P, 3); gt_pc: (B, N, 3) — channel-last (the reference
    is Bx3xP / Bx3xN, losses.py:237-241).
    """
    d = pairwise_sqdist(predict_pc, gt_pc)  # (B, P, N)

    # predict -> gt: nearest gt point for each predicted point
    idx_fwd = jnp.argmin(d, axis=-1)  # (B, P)
    sel_gt = jnp.take_along_axis(gt_pc, idx_fwd[..., None], axis=1)  # (B, P, 3)
    fwd_elem = robust_norm(sel_gt - predict_pc)

    # gt -> predict: nearest predicted point for each gt point
    idx_bwd = jnp.argmin(d, axis=-2)  # (B, N)
    sel_pred = jnp.take_along_axis(predict_pc, idx_bwd[..., None], axis=1)
    bwd_elem = robust_norm(sel_pred - gt_pc)

    forward_loss = jnp.mean(fwd_elem)
    backward_loss = jnp.mean(bwd_elem)
    forward_array = jnp.mean(fwd_elem, axis=-1)
    backward_array = jnp.mean(bwd_elem, axis=-1)
    return ChamferResult(loss=forward_loss + backward_loss,
                         forward_loss=forward_loss,
                         backward_loss=backward_loss,
                         loss_array=forward_array + backward_array,
                         forward_array=forward_array,
                         backward_array=backward_array)
