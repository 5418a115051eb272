"""Native C++ batch loader (sonet_tpu/native/loader.cpp) tests.

The native loader replaces the reference's DataLoader worker processes
(modelnet/train.py:25): npy read + distinct subsample + the train
augmentation stack (modelnet_shrec_loader.py:193-245) run in C++
threads.  These tests pin: file parsing, subsample-without-replacement
semantics, determinism per (seed, mode, epoch, index), augmentation
bounds, and BatchLoader integration.
"""

import os

import numpy as np
import pytest

from sonet_tpu.config import modelnet40
from sonet_tpu.data.native_loader import NativeModelNetDataset, native_available
from sonet_tpu.data.pipeline import BatchLoader

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")

N_FULL = 120
M = 16  # 4x4 som


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    """Tiny ModelNet-layout tree: 2 classes x 3 shapes."""
    root = tmp_path_factory.mktemp("modelnet_native")
    rs = np.random.RandomState(7)
    classes = ["airplane", "bed"]
    names = []
    for ci, cls in enumerate(classes):
        os.makedirs(root / cls)
        os.makedirs(root / "4x4_som_nodes" / cls)
        for i in range(3):
            name = f"{cls}_{i:04d}"
            names.append(name)
            np.save(root / cls / f"{name}.npy",
                    rs.randn(N_FULL, 6).astype(np.float32))
            np.save(root / "4x4_som_nodes" / cls / f"{name}.npy",
                    rs.randn(M, 3).astype(np.float32))
    (root / "modelnet40_shape_names.txt").write_text(
        "\n".join(classes) + "\n")
    (root / "modelnet40_train.txt").write_text("\n".join(names) + "\n")
    (root / "modelnet40_test.txt").write_text("\n".join(names[:4]) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def cfg():
    return modelnet40().replace(
        input_pc_num=50, node_num=M, rot_horizontal=True,
        rot_perturbation=True, translation_perturbation=False,
        input_pipeline="native")


def test_eval_batch_is_subset_of_file(root, cfg):
    ds = NativeModelNetDataset(root, "test", cfg)
    batch = ds.make_batch([0, 1, 2, 3], valid=4)
    assert batch["pc"].shape == (4, 50, 3)
    assert batch["sn"].shape == (4, 50, 3)
    assert batch["node"].shape == (4, M, 3)
    assert batch["pc"].dtype == np.float32
    for b in range(4):
        pc_path, label, som_path = ds.items[b]
        raw = np.load(pc_path)
        rows = {tuple(r) for r in raw[:, :3].tolist()}
        got = [tuple(r) for r in batch["pc"][b].tolist()]
        assert all(r in rows for r in got)
        # without replacement: all distinct
        assert len(set(got)) == 50
        assert np.array_equal(batch["node"][b],
                              np.load(som_path).astype(np.float32))
        assert batch["label"][b] == label


def test_deterministic_and_epoch_varying(root, cfg):
    ds = NativeModelNetDataset(root, "train", cfg)
    ds.set_epoch(3)
    b1 = ds.make_batch([0, 1], valid=2)
    b2 = ds.make_batch([0, 1], valid=2)
    assert np.array_equal(b1["pc"], b2["pc"])
    assert np.array_equal(b1["node"], b2["node"])
    ds.set_epoch(4)
    b3 = ds.make_batch([0, 1], valid=2)
    assert not np.array_equal(b1["pc"], b3["pc"])


def test_augmentation_bounds(root, cfg):
    """Scale/jitter/rotation keep norms within the analytic envelope."""
    ds = NativeModelNetDataset(root, "train", cfg)
    batch = ds.make_batch(list(range(6)), valid=6)
    for b in range(6):
        pc_path, _, _ = ds.items[b]
        raw = np.load(pc_path)
        r_max = np.linalg.norm(raw[:, :3], axis=1).max()
        got_max = np.linalg.norm(batch["pc"][b], axis=1).max()
        # rotations preserve norm; jitter <= clip*sqrt(3); scale <= 1.2
        assert got_max <= 1.2 * (r_max + 0.05 * np.sqrt(3)) + 1e-5


def test_batchloader_uses_make_batch(root, cfg):
    ds = NativeModelNetDataset(root, "train", cfg)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=0,
                         num_threads=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["pc"].shape == (2, 50, 3)
        assert b["valid"] == 2


def test_matches_python_distribution(root, cfg):
    """Same transform family as the numpy path: per-batch statistics of
    the augmented clouds agree loosely (stream differs by design)."""
    from sonet_tpu.data.modelnet import ModelNetDataset
    nat = NativeModelNetDataset(root, "train", cfg)
    py = ModelNetDataset(root, "train", cfg)
    nb = nat.make_batch(list(range(6)), valid=6)
    pb = [py[i] for i in range(6)]
    nat_std = np.std(nb["pc"])
    py_std = np.std(np.stack([it["pc"] for it in pb]))
    assert abs(nat_std - py_std) / py_std < 0.25
