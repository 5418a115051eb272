"""Training losses and classification metrics.

Reference: torch ``nn.CrossEntropyLoss`` for classification
(classifier.py:38) and ``CrossEntropyLossSeg`` = NLL(log_softmax) over
per-point scores (losses.py:30-43) — both are mean softmax cross-entropy.
The Chamfer loss lives in ``sonet_tpu.ops.chamfer``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax CE: logits (B, C), labels (B,) int."""
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def cross_entropy_seg(scores: jax.Array, seg: jax.Array) -> jax.Array:
    """Per-point mean softmax CE (losses.py:30-43).

    scores: (B, N, C) — NB channel-last (reference is BxCxN); seg: (B, N).
    """
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(scores, seg))


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Top-1 accuracy (classifier.py:114-118)."""
    return jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))


def seg_accuracy(scores: jax.Array, seg: jax.Array) -> jax.Array:
    """Per-point accuracy (segmenter.py:157-161)."""
    return jnp.mean((jnp.argmax(scores, -1) == seg).astype(jnp.float32))
