"""Native C++ batch loader (sonet_tpu/native/loader.cpp) tests.

The native loader replaces the reference's DataLoader worker processes
(modelnet/train.py:25): npy read + distinct subsample + the train
augmentation stack (modelnet_shrec_loader.py:193-245) run in C++
threads.  These tests pin: file parsing, subsample-without-replacement
semantics, determinism per (seed, mode, epoch, index), augmentation
bounds, and BatchLoader integration.
"""

import json
import os

import numpy as np
import pytest

from sonet_tpu.config import modelnet40, shapenetpart, shrec16
from sonet_tpu.data.native_loader import (NativeModelNetDataset,
                                          NativeShapeNetPartDataset,
                                          NativeShrecDataset,
                                          native_available)
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


@pytest.fixture(scope="module")
def shrec_root(tmp_path_factory):
    """Tiny SHREC2016-layout tree: 2 categories x 2 shapes per split."""
    root = tmp_path_factory.mktemp("shrec_native")
    rs = np.random.RandomState(11)
    (root / "category.txt").write_text("cat_a\ncat_b\n")
    train_lines, val_lines = [], []
    for mode, lines in (("train", train_lines), ("val", val_lines)):
        os.makedirs(root / "4x4" / mode)
        for i, cat in enumerate(["cat_a", "cat_b"] * 2):
            name = f"{(100 if mode == 'train' else 200) + i:06d}"
            lines.append(f"{name},{cat}")
            np.savez(root / "4x4" / mode / f"model_{name}.npz",
                     pc=rs.randn(N_FULL, 3).astype(np.float32),
                     sn=rs.randn(N_FULL, 3).astype(np.float32),
                     som_node=rs.randn(M, 3).astype(np.float32))
    (root / "train.txt").write_text("\n".join(train_lines) + "\n")
    (root / "val.txt").write_text("\n".join(val_lines) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def shapenet_root(tmp_path_factory):
    """Tiny ShapeNetPart-layout tree: 2 folders x 3 shapes, one tiny
    (forces the up-resample-with-replacement branch)."""
    from sonet_tpu.data.shapenet import FOLDERS
    root = tmp_path_factory.mktemp("shapenet_native")
    rs = np.random.RandomState(13)
    entries = []
    os.makedirs(root / "train_test_split")
    for fi, folder in enumerate(FOLDERS[:2]):
        os.makedirs(root / folder)
        for i in range(3):
            name = f"shape{fi}{i}"
            entries.append(f"shape_data/{folder}/{name}")
            n = 20 if (fi == 1 and i == 2) else N_FULL  # one tiny cloud
            np.savez(root / folder / f"{name}_4x4.npz",
                     pc=rs.randn(n, 3).astype(np.float32),
                     sn=rs.randn(n, 3).astype(np.float32),
                     part_label=rs.randint(0, 6, n).astype(np.int32),
                     som_node=rs.randn(M, 3).astype(np.float32))
    for mode in ("train", "test"):
        with open(root / "train_test_split"
                  / f"shuffled_{mode}_file_list.json", "w") as f:
            json.dump(entries, f)
    return str(root)


class TestShrecNpz:
    @pytest.fixture(scope="class")
    def cfg(self):
        return shrec16().replace(input_pc_num=50, node_num=M, batch_size=2,
                                 input_pipeline="native")

    def test_eval_batch_matches_files(self, shrec_root, cfg):
        ds = NativeShrecDataset(shrec_root, "val", cfg)
        batch = ds.make_batch([0, 1, 2, 3], valid=4)
        assert batch["pc"].shape == (4, 50, 3)
        assert batch["id"].tolist() == [200, 201, 202, 203]
        assert batch["label"].tolist() == [0, 1, 0, 1]
        for b in range(4):
            data = np.load(ds.items[b][0])
            rows = {tuple(r) for r in data["pc"].tolist()}
            got = [tuple(r) for r in batch["pc"][b].tolist()]
            assert all(r in rows for r in got)
            assert len(set(got)) == 50  # without replacement
            assert np.array_equal(batch["node"][b], data["som_node"])

    def test_train_deterministic_and_epoch_varying(self, shrec_root, cfg):
        ds = NativeShrecDataset(shrec_root, "train", cfg)
        ds.set_epoch(1)
        b1 = ds.make_batch([0, 1], valid=2)
        b2 = ds.make_batch([0, 1], valid=2)
        assert np.array_equal(b1["pc"], b2["pc"])
        ds.set_epoch(2)
        assert not np.array_equal(b1["pc"],
                                  ds.make_batch([0, 1], valid=2)["pc"])

    def test_build_dataset_selects_native(self, shrec_root, cfg):
        from sonet_tpu.train.trainer import build_dataset
        ds = build_dataset(cfg.replace(dataroot=shrec_root), "train")
        assert isinstance(ds, NativeShrecDataset)


class TestShapeNetNpz:
    @pytest.fixture(scope="class")
    def cfg(self):
        return shapenetpart().replace(input_pc_num=50, node_num=M,
                                      batch_size=2,
                                      input_pipeline="native")

    def test_eval_batch_with_seg(self, shapenet_root, cfg):
        ds = NativeShapeNetPartDataset(shapenet_root, "test", cfg)
        batch = ds.make_batch(list(range(6)), valid=6)
        assert batch["pc"].shape == (6, 50, 3)
        assert batch["seg"].shape == (6, 50)
        assert batch["seg"].dtype == np.int64
        assert batch["label"].tolist() == [0, 0, 0, 1, 1, 1]
        for b in range(6):
            file = ds.items[b][11:]
            data = np.load(os.path.join(shapenet_root, f"{file}_4x4.npz"))
            # seg label must ride with its point through the subsample
            pair = {tuple(r) + (int(s),) for r, s in
                    zip(data["pc"].tolist(), data["part_label"].tolist())}
            got = {tuple(r) + (int(s),) for r, s in
                   zip(batch["pc"][b].tolist(), batch["seg"][b].tolist())}
            assert got <= pair

    def test_up_resample_small_cloud(self, shapenet_root, cfg):
        ds = NativeShapeNetPartDataset(shapenet_root, "test", cfg)
        batch = ds.make_batch([5], valid=1)  # the 20-point cloud
        data = np.load(os.path.join(shapenet_root,
                                    f"{ds.items[5][11:]}_4x4.npz"))
        rows = [tuple(r) for r in data["pc"].tolist()]
        got = [tuple(r) for r in batch["pc"][0].tolist()]
        assert all(r in rows for r in got)
        # all 20 originals kept, then resampled with replacement
        assert set(got) == set(rows)

    def test_train_augment_is_jitter_scale_only(self, shapenet_root, cfg):
        """ShapeNet mode: no rotation — augmented points stay within
        jitter+scale distance of SOME subsampled source point."""
        ds = NativeShapeNetPartDataset(shapenet_root, "train", cfg)
        batch = ds.make_batch([0], valid=1)
        data = np.load(os.path.join(shapenet_root,
                                    f"{ds.items[0][11:]}_4x4.npz"))
        src = data["pc"]  # (N, 3)
        got = batch["pc"][0]
        # scale in [0.8, 1.2], jitter clip 0.05/axis: distance from the
        # scaled source row <= 0.05*sqrt(3)*1.2 + eps
        d = np.linalg.norm(got[:, None, :] - src[None, :, :] * 1.0, axis=-1)
        # compare against best scale estimate per batch: recover it from
        # the norm ratio median
        scale = np.median(np.linalg.norm(got, axis=1)
                          / np.linalg.norm(src[np.argmin(d, 1)], axis=1))
        assert 0.8 - 0.02 <= scale <= 1.2 + 0.02
        d_scaled = np.linalg.norm(
            got - src[np.argmin(d, 1)] * scale, axis=-1)
        assert d_scaled.max() <= 0.05 * np.sqrt(3) + 0.02

    def test_batchloader_integration(self, shapenet_root, cfg):
        ds = NativeShapeNetPartDataset(shapenet_root, "train", cfg)
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=0,
                             num_threads=2)
        batches = list(loader)
        assert len(batches) == 3
        for b in batches:
            assert b["pc"].shape == (2, 50, 3)
            assert b["seg"].shape == (2, 50)


def test_fortran_order_members(tmp_path):
    """F-contiguous members (np.asarray of a transposed array — the
    prep-som node files are exactly this) must parse identically to
    C-order, for both the npy and npz paths."""
    from sonet_tpu import native
    rs = np.random.RandomState(3)
    pc = rs.randn(N_FULL, 3).astype(np.float32)
    sn = rs.randn(N_FULL, 3).astype(np.float32)
    node = rs.randn(M, 3).astype(np.float32)
    node_f = np.asfortranarray(node)
    assert node_f.flags["F_CONTIGUOUS"] and not node_f.flags["C_CONTIGUOUS"]

    # npz path (shrec/shapenet layouts)
    pz_c, pz_f = tmp_path / "c.npz", tmp_path / "f.npz"
    np.savez(pz_c, pc=pc, sn=sn, som_node=node)
    np.savez(pz_f, pc=np.asfortranarray(pc), sn=np.asfortranarray(sn),
             som_node=node_f)
    seeds = np.asarray([42], np.uint64)
    out_c = native.load_npz_batch_native([str(pz_c)], seeds, 50, M)
    out_f = native.load_npz_batch_native([str(pz_f)], seeds, 50, M)
    for a, b in zip(out_c, out_f):
        assert np.array_equal(a, b)

    # npy path (modelnet layout): F-order som-node file
    raw = rs.randn(N_FULL, 6).astype(np.float32)
    np.save(tmp_path / "raw.npy", raw)
    np.save(tmp_path / "som_c.npy", node)
    np.save(tmp_path / "som_f.npy", node_f)
    a = native.load_batch_native([str(tmp_path / "raw.npy")],
                                 [str(tmp_path / "som_c.npy")], seeds,
                                 50, M, augment=False)
    b = native.load_batch_native([str(tmp_path / "raw.npy")],
                                 [str(tmp_path / "som_f.npy")], seeds,
                                 50, M, augment=False)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_worker_error_propagates(root, cfg):
    """A failing item must raise in the consumer — never silently
    truncate the epoch (the bug: an unreadable file yielded an empty
    loader and an opaque StopIteration at Trainer startup)."""
    ds = NativeModelNetDataset(root, "train", cfg)
    ds.items[1] = (str(root) + "/missing.npy", 0,
                   str(root) + "/missing_som.npy")
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_threads=2)
    with pytest.raises(RuntimeError, match="cannot open"):
        list(loader)


def test_truncated_npz_clean_errors(tmp_path):
    """Every truncation of a valid npz must raise RuntimeError through
    the loader's error path — never crash or return garbage."""
    from sonet_tpu import native
    rs = np.random.RandomState(5)
    p = tmp_path / "ok.npz"
    np.savez(p, pc=rs.randn(60, 3).astype(np.float32),
             sn=rs.randn(60, 3).astype(np.float32),
             som_node=rs.randn(M, 3).astype(np.float32))
    blob = p.read_bytes()
    seeds = np.zeros(1, np.uint64)
    # full file parses
    native.load_npz_batch_native([str(p)], seeds, 50, M)
    bad = tmp_path / "bad.npz"
    for frac in (0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        bad.write_bytes(blob[:int(len(blob) * frac)])
        with pytest.raises(RuntimeError):
            native.load_npz_batch_native([str(bad)], seeds, 50, M)
    # int-typed sn member: clean dtype error, not an OOB read
    np.savez(bad, pc=rs.randn(60, 3).astype(np.float32),
             sn=rs.randint(0, 5, (60, 3)).astype(np.int32),
             som_node=rs.randn(M, 3).astype(np.float32))
    with pytest.raises(RuntimeError, match="dtype|shape"):
        native.load_npz_batch_native([str(bad)], seeds, 50, M)
    # empty pc member: clean error, not uniform_int_distribution UB
    np.savez(bad, pc=np.zeros((0, 3), np.float32),
             sn=np.zeros((0, 3), np.float32),
             som_node=rs.randn(M, 3).astype(np.float32))
    with pytest.raises(RuntimeError, match="empty"):
        native.load_npz_batch_native([str(bad)], seeds, 50, M)


def test_savez_compressed_rejected(tmp_path):
    from sonet_tpu import native
    p = tmp_path / "c.npz"
    np.savez_compressed(p, pc=np.zeros((10, 3), np.float32),
                        sn=np.zeros((10, 3), np.float32),
                        som_node=np.zeros((M, 3), np.float32))
    with pytest.raises(RuntimeError, match="compressed"):
        native.load_npz_batch_native([str(p)], np.zeros(1, np.uint64),
                                     5, M)


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
