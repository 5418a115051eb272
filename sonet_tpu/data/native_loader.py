"""Native (C++) host input pipeline for the ModelNet npy layout.

``NativeModelNetDataset`` is a drop-in ``ModelNetDataset`` whose batch
assembly runs in C++ worker threads (``sonet_tpu/native/loader.cpp``):
npy parse, distinct subsample and the full train augmentation stack
execute in one shared-library call with the GIL released — the
TPU-framework equivalent of the reference's
``DataLoader(num_workers=8)`` worker *processes* (modelnet/train.py:25).
The ``BatchLoader`` calls ``make_batch`` instead of per-item
``__getitem__`` when a dataset provides it.

Determinism: item seeds derive from the same (seed, mode, epoch, index)
tuple as the numpy path (data/seeding.py) via ``SeedSequence``; the C++
RNG *stream* differs from numpy's PCG64, so augmented values match the
python pipeline in distribution, not bitwise (PARITY.md).

Select with ``--input_pipeline native``.  Falls back transparently: the
python ``__getitem__`` path stays available (used by e.g. retrieval
feature extraction).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..config import Config
from .modelnet import ModelNetDataset
from .pipeline import Dataset  # noqa: F401  (protocol reference)


def native_available() -> bool:
    try:
        from .. import native
        return native.available()
    except Exception:
        return False


class NativeModelNetDataset(ModelNetDataset):
    """ModelNet npy dataset with C++ batch assembly (``make_batch``)."""

    def __init__(self, root: str, mode: str, cfg: Config, *,
                 num_threads: int | None = None):
        super().__init__(root, mode, cfg)
        from .. import native
        native.build()  # fail fast if the toolchain is unavailable
        self._native = native
        self.num_threads = num_threads or min(os.cpu_count() or 1, 8)

    def item_seed(self, idx: int) -> np.uint64:
        ss = np.random.SeedSequence(
            (self._seed, self._mode_id, self._epoch, int(idx)))
        return ss.generate_state(1, np.uint64)[0]

    def make_batch(self, indices, valid: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        pc_paths, som_paths, labels, seeds = [], [], [], []
        for i in indices:
            pc_path, label, som_path = self.items[int(i)]
            pc_paths.append(pc_path)
            som_paths.append(som_path)
            labels.append(label)
            seeds.append(self.item_seed(int(i)))
        pc, sn, node = self._native.load_batch_native(
            pc_paths, som_paths, np.asarray(seeds, np.uint64),
            cfg.input_pc_num, cfg.node_num,
            augment=(self.mode == "train"),
            rot_horizontal=cfg.rot_horizontal,
            rot_perturbation=cfg.rot_perturbation,
            translation_perturbation=cfg.translation_perturbation,
            num_threads=self.num_threads)
        batch = {"pc": pc, "sn": sn, "node": node,
                 "label": np.asarray(labels, np.int64),
                 "valid": np.asarray(valid, np.int32)}
        return batch
