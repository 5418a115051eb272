"""End-to-end `sonet reproduce`: archive -> ingest -> som -> check ->
train -> gated verdict, one command (VERDICT r3 #3).

Uses an in-repo fixture archive (tiny modelnet-layout tree, class-
separated clusters) so the whole chain — including the idempotent
resume path — is pinned without real data.
"""

import json
import os
import tarfile

import numpy as np
import pytest

from sonet_tpu.tasks.reproduce import main as reproduce_main

CLASSES, TRAIN_N, TEST_N, POINTS = 3, 4, 2, 160


def _make_modelnet_tree(root: str, seed: int = 0) -> None:
    """Tiny tree in the exact reference layout (modelnet.py:38-54):
    modelnet3_shape_names.txt / modelnet3_{train,test}.txt /
    <class>/<class>_NNNN.npy (N, 6).  No SOM nodes — reproduce must
    fit them."""
    rng = np.random.default_rng(seed)
    names = [f"shape{c}" for c in range(CLASSES)]
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root,
                           f"modelnet{CLASSES}_shape_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    # class-separated Gaussian blobs: 2 epochs of the tiny model can
    # reach sane (finite, bounded) metrics on them
    centers = np.eye(3)[:CLASSES]
    for mode, n, base in (("train", TRAIN_N, 0), ("test", TEST_N, 1000)):
        entries = []
        for c, nm in enumerate(names):
            os.makedirs(os.path.join(root, nm), exist_ok=True)
            for j in range(n):
                ident = f"{nm}_{base + j + 1:04d}"
                pc = centers[c] + 0.15 * rng.standard_normal((POINTS, 3))
                sn = rng.standard_normal((POINTS, 3))
                sn /= np.linalg.norm(sn, axis=1, keepdims=True)
                np.save(os.path.join(root, nm, ident + ".npy"),
                        np.concatenate([pc, sn], 1).astype(np.float32))
                entries.append(ident)
        with open(os.path.join(root,
                               f"modelnet{CLASSES}_{mode}.txt"), "w") as f:
            f.write("\n".join(entries) + "\n")


def _argv(arch, dest, ckpt):
    return ["--preset", "modelnet40", "--archive", str(arch),
            "--dest", str(dest),
            "--classes", str(CLASSES), "--node_num", "16", "--k", "2",
            "--som_k", "4", "--feature_num", "64",
            "--input_pc_num", "64", "--batch_size", "4",
            "--epochs", "2", "--checkpoints_dir", str(ckpt),
            "--checkpoint_every", "1", "--compute_dtype", "float32",
            "--som_sample", "256", "--som_batch", "16",
            "--check_load", "2"]


def _verdict(out: str) -> dict:
    lines = [ln for ln in out.splitlines()
             if ln.startswith('{"reproduce"')]
    assert lines, out
    return json.loads(lines[-1])


@pytest.mark.slow
def test_reproduce_archive_to_verdict_and_resume(tmp_path, capsys):
    tree = tmp_path / "tree"
    _make_modelnet_tree(str(tree))
    arch = tmp_path / "mn3.tar.gz"
    with tarfile.open(arch, "w:gz") as t:
        t.add(tree, arcname="modelnet3")
    dest, ckpt = tmp_path / "data", tmp_path / "runs"

    rc = reproduce_main(_argv(arch, dest, ckpt))
    out = capsys.readouterr().out
    v = _verdict(out)
    # the chain ran: ingest manifest + fitted SOM nodes + verdict gated
    # on the reference's own save threshold
    assert (dest / "ingest.json").exists()
    assert (dest / "4x4_som_nodes" / "shape0").exists()
    assert v["metric"] == "accuracy" and v["gate"] == 0.918
    assert v["best"] is not None and 0.0 <= v["best"] <= 1.0
    assert v["pass"] in (True, False)
    assert rc == (0 if v["pass"] else 1)

    # resume path: SAME command — reuses the ingested tree, restores
    # the latest checkpoint, trains only the remaining (0) epochs
    rc2 = reproduce_main(_argv(arch, dest, ckpt))
    out2 = capsys.readouterr().out
    assert "reusing ingested tree" in out2
    assert "2/2 epochs already trained" in out2
    v2 = _verdict(out2)
    assert v2["metric"] == "accuracy"
    assert rc2 == (0 if v2["pass"] else 1)


def _make_shapenet_tree(root: str, rows: int = 4, points: int = 160,
                        seed: int = 0) -> None:
    """Tiny ShapeNetPart-layout tree (shapenet.py:38-70): split JSONs at
    train_test_split/shuffled_{train,test}_file_list.json with
    'shape_data/<folder>/<name>' entries, per-shape
    <folder>/<name>_<rows>x<rows>.npz with {pc, sn, part_label} — NO
    som_node, so reproduce must take the npz-rewrite SOM branch
    (tasks/reproduce.py _som_missing 'shapenet')."""
    import json as _json

    from sonet_tpu.data.shapenet import FOLDERS

    rng = np.random.default_rng(seed)
    # Airplane (parts 0-3) and Bag (parts 4-5) — labels must stay inside
    # the category's slice of the 16->50 table (ops/iou.py PART_LABEL)
    cats = [(FOLDERS[0], (0, 1)), (FOLDERS[1], (4, 5))]
    splits = {"train": [], "test": []}
    for folder, (pa, pb) in cats:
        os.makedirs(os.path.join(root, folder), exist_ok=True)
        for mode, n, base in (("train", 4, 0), ("test", 2, 100)):
            for j in range(n):
                name = f"{base + j:06d}"
                pc = 0.3 * rng.standard_normal((points, 3))
                pc[:, 0] += (1.0 if folder == FOLDERS[0] else -1.0)
                sn = rng.standard_normal((points, 3))
                sn /= np.linalg.norm(sn, axis=1, keepdims=True)
                # part split by a simple geometric rule so 2 epochs can
                # reach a sane (finite) IoU
                part = np.where(pc[:, 1] > pc[:, 1].mean(), pa, pb)
                np.savez(os.path.join(root, folder,
                                      f"{name}_{rows}x{rows}.npz"),
                         pc=pc.astype(np.float32),
                         sn=sn.astype(np.float32),
                         part_label=part.astype(np.int64))
                splits[mode].append(f"shape_data/{folder}/{name}")
    os.makedirs(os.path.join(root, "train_test_split"), exist_ok=True)
    for mode, entries in splits.items():
        with open(os.path.join(root, "train_test_split",
                               f"shuffled_{mode}_file_list.json"),
                  "w") as f:
            _json.dump(entries, f)


@pytest.mark.slow
def test_reproduce_shapenetpart_layout(tmp_path, capsys):
    """shapenetpart end-to-end (VERDICT r4 #5): exercises the split-JSON
    'shape_data/' prefix strip, the npz som_node rewrite, the shapenet
    prep-check path, and the IoU-gated verdict."""
    tree = tmp_path / "tree"
    _make_shapenet_tree(str(tree))
    arch = tmp_path / "snpart.tar.gz"
    with tarfile.open(arch, "w:gz") as t:
        t.add(tree, arcname="shapenetcore_partanno")
    dest, ckpt = tmp_path / "data", tmp_path / "runs"

    argv = ["--preset", "shapenetpart", "--archive", str(arch),
            "--dest", str(dest),
            "--node_num", "16", "--k", "2", "--som_k", "4",
            "--feature_num", "64", "--input_pc_num", "64",
            "--batch_size", "4", "--epochs", "2",
            "--checkpoints_dir", str(ckpt), "--checkpoint_every", "1",
            "--compute_dtype", "float32",
            "--som_sample", "128", "--som_batch", "8",
            "--check_load", "2"]
    rc = reproduce_main(argv)
    out = capsys.readouterr().out
    v = _verdict(out)
    assert (dest / "ingest.json").exists()
    # the SOM rewrite landed INSIDE the npz files (no sidecar dir)
    from sonet_tpu.data.shapenet import FOLDERS
    first = sorted((dest / FOLDERS[0]).glob("*_4x4.npz"))[0]
    with np.load(first) as z:
        assert "som_node" in z.files and z["som_node"].shape == (16, 3)
    assert v["metric"] == "iou" and v["gate"] == 0.835
    assert v["best"] is not None and 0.0 <= v["best"] <= 1.0
    assert v["pass"] in (True, False)
    assert rc == (0 if v["pass"] else 1)

    # resume: same command reuses the tree (som_node now present) and
    # trains 0 remaining epochs
    rc2 = reproduce_main(argv)
    out2 = capsys.readouterr().out
    assert "reusing ingested tree" in out2
    assert "2/2 epochs already trained" in out2
    assert rc2 == (0 if _verdict(out2)["pass"] else 1)


def _make_shrec_tree(root: str, rows: int = 4, points: int = 160,
                     classes: int = 3, seed: int = 0) -> None:
    """Tiny SHREC16-layout tree (modelnet.py:56-80): category.txt,
    '<name>,<category>' train/val lists, npz at
    <rows>x<rows>/<mode>/model_<name>.npz with {pc, sn} — no som_node,
    so reproduce must take the shrec _som_missing branch."""
    rng = np.random.default_rng(seed)
    cats = [f"cat{c}" for c in range(classes)]
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "category.txt"), "w") as f:
        f.write("\n".join(cats) + "\n")
    centers = np.eye(3)[:classes]
    for mode, n, base in (("train", 4, 0), ("val", 2, 1000)):
        os.makedirs(os.path.join(root, f"{rows}x{rows}", mode),
                    exist_ok=True)
        lines = []
        for c, cat in enumerate(cats):
            for j in range(n):
                name = str(base + c * n + j + 1)
                pc = centers[c] + 0.15 * rng.standard_normal((points, 3))
                sn = rng.standard_normal((points, 3))
                sn /= np.linalg.norm(sn, axis=1, keepdims=True)
                np.savez(os.path.join(root, f"{rows}x{rows}", mode,
                                      f"model_{name}.npz"),
                         pc=pc.astype(np.float32),
                         sn=sn.astype(np.float32))
                lines.append(f"{name},{cat}")
        with open(os.path.join(root, f"{mode}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_reproduce_shrec16_layout(tmp_path, capsys):
    """shrec16 end-to-end (VERDICT r4 #5): the npz-layout ingest, the
    shrec _som_missing branch, val-split eval, and the gateless verdict
    (GATES has no reference threshold for shrec -> rc 0, pass None).
    Keeps the preset's som_k=0 (KNNModule disabled — the real shrec16
    configuration, shrec16/options.py)."""
    tree = tmp_path / "tree"
    _make_shrec_tree(str(tree))
    arch = tmp_path / "shrec.tar.gz"
    with tarfile.open(arch, "w:gz") as t:
        t.add(tree, arcname="shrec2016")
    dest, ckpt = tmp_path / "data", tmp_path / "runs"

    rc = reproduce_main(
        ["--preset", "shrec16", "--archive", str(arch),
         "--dest", str(dest), "--classes", "3",
         "--node_num", "16", "--k", "2",
         "--feature_num", "64", "--input_pc_num", "64",
         "--batch_size", "4", "--epochs", "2",
         "--checkpoints_dir", str(ckpt), "--checkpoint_every", "1",
         "--compute_dtype", "float32",
         "--som_sample", "128", "--som_batch", "8",
         "--check_load", "2"])
    out = capsys.readouterr().out
    v = _verdict(out)
    assert (dest / "ingest.json").exists()
    first = sorted((dest / "4x4" / "train").glob("model_*.npz"))[0]
    with np.load(first) as z:
        assert "som_node" in z.files and z["som_node"].shape == (16, 3)
    assert v["metric"] == "accuracy"
    assert v["gate"] is None and v["pass"] is None
    assert v["best"] is not None and 0.0 <= v["best"] <= 1.0
    assert rc == 0


def test_reproduce_rejects_missing_inputs(capsys):
    # no archive and no dataroot: broken-chain exit code, no training
    rc = reproduce_main(["--preset", "modelnet40"])
    assert rc == 2
    assert "need --archive or --dataroot" in capsys.readouterr().err
