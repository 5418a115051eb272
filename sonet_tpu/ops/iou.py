"""ShapeNetPart mIoU metric, vectorized and jittable.

The reference computes IoU in a Python double loop over shapes and parts
on CPU tensors (models/losses.py:119-189) — flagged HOT in SURVEY.md §3.3.
Here the hardcoded 16-category -> 50-part mapping (losses.py:126-143) is
turned into a padded (16, MAX_PARTS) table + validity mask so the whole
batch reduces on device in one shot.

Parity quirk kept: union == 0 -> IoU 1.0 (losses.py:162-165), and the
reference's ``union + 1e-4`` denominator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 16 ShapeNetPart categories -> their part label ids (losses.py:126-143).
PART_LABEL = [
    [0, 1, 2, 3], [4, 5], [6, 7], [8, 9, 10, 11], [12, 13, 14, 15],
    [16, 17, 18], [19, 20, 21], [22, 23], [24, 25, 26, 27], [28, 29],
    [30, 31, 32, 33, 34, 35], [36, 37], [38, 39, 40], [41, 42, 43],
    [44, 45, 46], [47, 48, 49],
]
MAX_PARTS = max(len(p) for p in PART_LABEL)  # 6
NUM_CATEGORIES = len(PART_LABEL)  # 16
NUM_PARTS = 50

# host-side (numpy) constants: creating device arrays at IMPORT time
# would initialize the jax backend before jax.distributed.initialize
# can run (parallel/distributed.py) — jnp converts them on first trace
PART_TABLE = np.full((NUM_CATEGORIES, MAX_PARTS), -1, np.int32)
for ci, parts in enumerate(PART_LABEL):
    PART_TABLE[ci, : len(parts)] = parts
PART_VALID = PART_TABLE >= 0                 # (16, 6) bool


def iou_per_shape(seg_pred: jax.Array, seg_gt: jax.Array,
                  label: jax.Array) -> jax.Array:
    """Instance-average IoU per shape.

    seg_pred, seg_gt: (B, N) int part labels; label: (B,) int category.
    Returns (B,) mean IoU over the category's parts.
    """
    parts = jnp.asarray(PART_TABLE)[label]    # (B, MAX_PARTS)
    valid = jnp.asarray(PART_VALID)[label]    # (B, MAX_PARTS)

    gt = seg_gt[:, None, :] == parts[:, :, None]      # (B, MP, N)
    pr = seg_pred[:, None, :] == parts[:, :, None]    # (B, MP, N)
    inter = jnp.sum(gt & pr, axis=-1).astype(jnp.float32)
    union = jnp.sum(gt | pr, axis=-1).astype(jnp.float32)
    iou = jnp.where(union == 0, 1.0, inter / (union + 1e-4))
    iou = jnp.where(valid, iou, 0.0)
    return jnp.sum(iou, axis=-1) / jnp.sum(valid, axis=-1)


def compute_iou(score: jax.Array, seg_gt: jax.Array,
                label: jax.Array) -> jax.Array:
    """Batch-mean IoU from raw per-point scores.

    score: (B, N, num_parts); seg_gt: (B, N); label: (B,).
    Mirrors losses.py:119-189 (argmax over parts, per-shape part-mean,
    batch mean).
    """
    seg_pred = jnp.argmax(score, axis=-1)
    return jnp.mean(iou_per_shape(seg_pred, seg_gt, label))
