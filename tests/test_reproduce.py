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


def test_reproduce_rejects_missing_inputs(capsys):
    # no archive and no dataroot: broken-chain exit code, no training
    rc = reproduce_main(["--preset", "modelnet40"])
    assert rc == 2
    assert "need --archive or --dataroot" in capsys.readouterr().err
