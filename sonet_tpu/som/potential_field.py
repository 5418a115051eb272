"""Potential-field SOM node initialization, vectorized.

Reference: util/potential_field.py:11-86 — an O(100 * M^2) Python double
loop computing N-body inverse-cube repulsion plus a wall force in
[-1,1]^dim, followed by a row-major (x, then y) grid reorder.  Here the
force field is a single vectorized numpy expression; the RNG seed (2017,
potential_field.py:15) and iteration schedule are kept so node layouts
match the reference bit-for-bit in exact arithmetic.

This runs once per (node_num, dim) at setup time and is cached.
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=16)
def potential_field_nodes(node_num: int, dim: int) -> np.ndarray:
    """Return (node_num, dim) float32 node positions in [-1, 1]^dim."""
    rng = np.random.RandomState(2017)  # same MT19937 stream as np.random.seed
    node = rng.rand(node_num, dim) * 2.0 - 1.0

    lr = 0.01
    for _ in range(100):
        # pairwise repulsion: f(src->dst) = (dst-src)/(|.|+1e-5)^3
        diff = node[None, :, :] - node[:, None, :]      # [src, dst, dim]
        norm = np.linalg.norm(diff, axis=-1) + 1e-5     # [src, dst]
        force = np.sum(diff / (norm ** 3)[..., None], axis=0)  # sum over src
        # wall force: -x * M / 1.5 per dim, dead zone |x| < 0.01
        wall = np.where(np.abs(node) < 0.01, 0.0, -node * node_num / 1.5)
        node = node + (force + wall) * lr

    return _grid_reorder(node).astype(np.float32)


def _grid_reorder(node: np.ndarray) -> np.ndarray:
    """Row-major reorder by (x, then y within row) so node id i maps to
    grid position (i // cols, i % cols) (potential_field.py:74-86)."""
    node_num, dim = node.shape
    rows = int(math.sqrt(node_num))
    cols = rows
    if rows * cols != node_num:
        # non-square node counts keep the x-sort only
        return node[node[:, 0].argsort()]
    ordered = node[node[:, 0].argsort()].reshape(rows, cols, dim)
    for i in range(rows):
        ordered[i] = ordered[i][ordered[i][:, 1].argsort()]
    return ordered.reshape(node_num, dim)
