"""Batched Self-Organizing Map, as pure jitted JAX.

Reference: util/som.py (classes SOM and BatchSOM) plus the near-duplicate
preprocessing variant data/build_som/util/som.py.  There, SOM fitting is
an offline CPU/GPU preprocessing step (README.md:45, save_som.ipynb);
here `fit` is a jitted `lax.scan` over a *batch* of clouds, so the whole
dataset's SOMs are built on-TPU in minutes and the same code path can run
online inside a training step.

State is explicit (nodes array in, nodes array out) — no mutable
`self.node` (util/som.py:192).

Two iteration schedules exist in the reference (SURVEY.md §2.1):

* ``schedule="online"`` — util/som.py:355-366: 20 warmup iters at
  (lr0, sigma0) then 60 iters with 1/(1 + 2 it/60) decay.
* ``schedule="prep"`` — data/build_som/util/som.py:364-366 (the variant
  the published datasets were actually built with): 10 warmup + 30 iters
  with the milder 1/(1 + it/30) decay.

The default for dataset preprocessing is "prep" to match the published
data; "online" matches the shipped util/som.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pairwise import assign_topk, one_hot_f32, pairwise_sqdist, TopKAssign
from .potential_field import potential_field_nodes


class SOMConfig(NamedTuple):
    rows: int = 8
    cols: int = 8
    dim: int = 3
    sigma: float = 0.4          # util/som.py:32
    learning_rate: float = 0.5  # util/som.py:33
    schedule: str = "prep"      # "prep" | "online"

    @property
    def node_num(self) -> int:
        return self.rows * self.cols


def init_nodes(cfg: SOMConfig, batch_size: int | None = None) -> jax.Array:
    """Potential-field initial nodes, optionally tiled to a batch.

    Returns (M, dim) or (B, M, dim) float32.
    """
    n = jnp.asarray(potential_field_nodes(cfg.node_num, cfg.dim))
    if batch_size is None:
        return n
    return jnp.broadcast_to(n, (batch_size, cfg.node_num, cfg.dim))


@functools.lru_cache(maxsize=16)
def _grid_log_gaussian(rows: int, cols: int, sigma: float) -> np.ndarray:
    """log of the init neighborhood weights between grid cells i and j.

    Reference builds w0[i] = outer(gauss_rows(i), gauss_cols(i)) with
    d = 2*pi*sigma^2 (util/som.py:212-227) and rescales to other sigmas
    via exp(log(w0) / (sigma/sigma0)^2) (util/som.py:229-232).  We store
    the log once: log w[i, j] = -((ri-rj)^2 + (ci-cj)^2) / (2 pi sigma^2).
    """
    idx = np.arange(rows * cols)
    ri, ci = idx // cols, idx % cols
    d2 = (ri[:, None] - ri[None, :]) ** 2 + (ci[:, None] - ci[None, :]) ** 2
    return (-d2 / (2.0 * np.pi * sigma * sigma)).astype(np.float32)


def batch_update(nodes: jax.Array, x: jax.Array, learning_rate: jax.Array,
                 sigma: jax.Array, cfg: SOMConfig) -> jax.Array:
    """One competitive-learning update (util/som.py:295-353), restructured
    so the node pull is two small matmuls instead of the reference's
    BxCxMxM broadcast:

        delta_j = lr * sum_i w[i,j] * occ_i * (mean_i - node_j)
                = lr * (w^T (occ * mean) - node_j * (w^T occ))

    nodes: (B, M, C); x: (B, N, C) -> new nodes (B, M, C).
    """
    B, M, C = nodes.shape
    d = pairwise_sqdist(x, nodes)                      # (B, N, M)
    min_idx = jnp.argmin(d, axis=-1)                   # (B, N)
    onehot = one_hot_f32(min_idx, M)                   # (B, N, M)
    counts = jnp.sum(onehot, axis=1)                   # (B, M)
    occupied = (counts > 0).astype(jnp.float32)        # mask_row_max
    # full-precision matmuls: SOM fitting is preprocessing, where node
    # quality matters more than MXU throughput (bf16 default-precision
    # einsum shifts nodes by ~2e-3 vs the f32 reference).
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.einsum("bnm,bnc->bmc", onehot, x, precision=hi,
                      preferred_element_type=jnp.float32) / (
        counts[..., None] + 1e-5)                      # (B, M, C)

    # neighborhood weights at this sigma: w = exp(logw0 / (sigma/sigma0)^2)
    logw0 = jnp.asarray(_grid_log_gaussian(cfg.rows, cfg.cols, cfg.sigma))
    scale = 1.0 / ((sigma / cfg.sigma) ** 2)
    w = jnp.exp(logw0 * scale)                         # (M_i, M_j)

    occ_mean = mean * occupied[..., None]              # zero empty means
    pull = jnp.einsum("ij,bic->bjc", w, occ_mean, precision=hi,
                      preferred_element_type=jnp.float32)
    gate = jnp.einsum("ij,bi->bj", w, occupied, precision=hi,
                      preferred_element_type=jnp.float32)
    delta = learning_rate * (pull - nodes * gate[..., None])
    return nodes + delta


def _schedule(cfg: SOMConfig) -> tuple[np.ndarray, np.ndarray]:
    """(lr, sigma) arrays for the full fit (warmup + decayed iters)."""
    lr0, s0 = cfg.learning_rate, cfg.sigma
    if cfg.schedule == "online":  # util/som.py:355-366
        warm, main, rate = 20, 60, 2.0
    elif cfg.schedule == "prep":  # data/build_som/util/som.py:355-366
        warm, main, rate = 10, 30, 1.0
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    it = np.arange(main, dtype=np.float32)
    decay = 1.0 / (1.0 + rate * it / main)
    lr = np.concatenate([np.full(warm, lr0, np.float32), lr0 * decay])
    sigma = np.concatenate([np.full(warm, s0, np.float32), s0 * decay])
    return lr, sigma


def fit(x: jax.Array, cfg: SOMConfig,
        init: jax.Array | None = None) -> jax.Array:
    """Fit one SOM per batch item: (B, N, dim) -> nodes (B, M, dim).

    Jittable; the fixed iteration schedule becomes a `lax.scan`
    (SURVEY.md §7 step 2), so preprocessing a whole dataset is a single
    compiled program vmapped/batched over shapes.
    """
    B = x.shape[0]
    nodes = init_nodes(cfg, B) if init is None else init
    lr, sigma = _schedule(cfg)

    def step(nodes, sched):
        lr_t, sigma_t = sched
        return batch_update(nodes, x, lr_t, sigma_t, cfg), None

    nodes, _ = jax.lax.scan(step, nodes,
                            (jnp.asarray(lr), jnp.asarray(sigma)))
    return nodes


def query(nodes: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Nearest-node assignment (util/som.py:271-293).

    Returns (min_idx (B, N) int32, occupied (B, M) bool).
    """
    d = pairwise_sqdist(x, nodes)
    min_idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
    B, M = nodes.shape[0], nodes.shape[1]
    occupied = jnp.zeros((B, M), jnp.int32).at[
        jnp.arange(B)[:, None], min_idx].max(1)
    return min_idx, occupied.astype(bool)


def query_topk(nodes: jax.Array, x: jax.Array, k: int) -> TopKAssign:
    """Top-k assignment (util/som.py:237-269) — see ops.assign_topk."""
    return assign_topk(x, nodes, k)
