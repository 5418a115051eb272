"""Native (C++) host input pipeline for every prepared dataset layout.

``NativeModelNetDataset`` / ``NativeShrecDataset`` /
``NativeShapeNetPartDataset`` are drop-in replacements whose batch
assembly runs in C++ worker threads (``sonet_tpu/native/loader.cpp``):
npy/npz parse, distinct subsample and the train augmentation stack
execute in one shared-library call with the GIL released — the
TPU-framework equivalent of the reference's
``DataLoader(num_workers=8)`` worker *processes* (modelnet/train.py:25,
part-seg/train.py:23, shrec16/train.py).  The ``BatchLoader`` calls
``make_batch`` instead of per-item ``__getitem__`` when a dataset
provides it.

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
from .modelnet import ModelNetDataset, ShrecDataset
from .pipeline import Dataset  # noqa: F401  (protocol reference)
from .shapenet import ShapeNetPartDataset


def native_available() -> bool:
    try:
        from .. import native
        return native.available()
    except Exception:
        return False


class _NativeMixin:
    """Shared C++-loader plumbing: library handle + per-item seeds."""

    def _init_native(self, num_threads: int | None) -> None:
        from .. import native
        native.build()  # fail fast if the toolchain is unavailable
        self._native = native
        self.num_threads = num_threads or min(os.cpu_count() or 1, 8)

    def item_seed(self, idx: int) -> np.uint64:
        ss = np.random.SeedSequence(
            (self._seed, self._mode_id, self._epoch, int(idx)))
        return ss.generate_state(1, np.uint64)[0]

    def _seeds(self, indices) -> np.ndarray:
        return np.asarray([self.item_seed(int(i)) for i in indices],
                          np.uint64)


class NativeModelNetDataset(_NativeMixin, ModelNetDataset):
    """ModelNet npy dataset with C++ batch assembly (``make_batch``)."""

    def __init__(self, root: str, mode: str, cfg: Config, *,
                 num_threads: int | None = None):
        super().__init__(root, mode, cfg)
        self._init_native(num_threads)

    def make_batch(self, indices, valid: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        pc_paths, som_paths, labels = [], [], []
        for i in indices:
            pc_path, label, som_path = self.items[int(i)]
            pc_paths.append(pc_path)
            som_paths.append(som_path)
            labels.append(label)
        pc, sn, node = self._native.load_batch_native(
            pc_paths, som_paths, self._seeds(indices),
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


class NativeShrecDataset(_NativeMixin, ShrecDataset):
    """SHREC2016 npz dataset with C++ batch assembly.

    Same layout/augmentation as ``ShrecDataset`` (reference
    modelnet_shrec_loader.py:67-113, 219-245) with the npz parse,
    distinct subsample and full train-augment stack in C++ threads."""

    def __init__(self, root: str, mode: str, cfg: Config, *,
                 num_threads: int | None = None):
        super().__init__(root, mode, cfg)
        self._init_native(num_threads)

    def make_batch(self, indices, valid: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        paths, labels, ids = [], [], []
        for i in indices:
            npz_path, label, name = self.items[int(i)]
            paths.append(npz_path)
            labels.append(label)
            try:
                ids.append(int(name))
            except ValueError:
                ids.append(int(i))
        pc, sn, node = self._native.load_npz_batch_native(
            paths, self._seeds(indices), cfg.input_pc_num, cfg.node_num,
            augment_mode=(1 if self.mode == "train" else 0),
            rot_horizontal=cfg.rot_horizontal,
            rot_perturbation=cfg.rot_perturbation,
            translation_perturbation=cfg.translation_perturbation,
            num_threads=self.num_threads)
        return {"pc": pc, "sn": sn, "node": node,
                "label": np.asarray(labels, np.int64),
                "id": np.asarray(ids, np.int64),
                "valid": np.asarray(valid, np.int32)}


class NativeShapeNetPartDataset(_NativeMixin, ShapeNetPartDataset):
    """ShapeNetPart npz dataset with C++ batch assembly.

    Same layout/augmentation as ``ShapeNetPartDataset`` (reference
    shapenet_loader.py:131-175: distinct subsample or up-resample with
    replacement, jitter+scale-only train augmentation) with the per-item
    work in C++ threads; per-point part labels ride along."""

    def __init__(self, root: str, mode: str, cfg: Config, *,
                 num_threads: int | None = None):
        super().__init__(root, mode, cfg)
        self._init_native(num_threads)

    def make_batch(self, indices, valid: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        paths, labels = [], []
        for i in indices:
            path, label = self.item_path_label(int(i))
            paths.append(path)
            labels.append(label)
        pc, sn, node, seg = self._native.load_npz_batch_native(
            paths, self._seeds(indices), cfg.input_pc_num, cfg.node_num,
            augment_mode=(2 if self.mode == "train" else 0),
            with_seg=True, num_threads=self.num_threads)
        return {"pc": pc, "sn": sn, "node": node,
                "label": np.asarray(labels, np.int64),
                "seg": seg.astype(np.int64),
                "valid": np.asarray(valid, np.int32)}
