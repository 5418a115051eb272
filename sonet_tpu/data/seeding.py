"""Deterministic per-item RNG for dataset augmentation.

Draws are a pure function of (seed, mode, epoch, index): reproducible
across runs (no salted ``hash()``) and across loader worker threads
(no shared-generator interleaving).  Datasets expose ``set_epoch`` so
the BatchLoader re-seeds each pass — augmentation still varies every
epoch like the reference's global-RNG behavior.
"""

from __future__ import annotations

import numpy as np

_MODE_IDS = {"train": 0, "test": 1, "val": 2}


def mode_id(mode: str) -> int:
    return _MODE_IDS.get(mode, 3)


class EpochSeeded:
    """Mixin: deterministic per-item generators keyed on epoch."""

    def _init_seeding(self, seed: int, mode: str) -> None:
        self._seed = int(seed)
        self._mode_id = mode_id(mode)
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def item_rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(
            (self._seed, self._mode_id, self._epoch, int(idx)))
