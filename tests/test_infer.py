"""Inference driver (tasks/infer.py) end-to-end: train a tiny run,
restore it from disk, stream the test split, check artifacts.

The reference has no inference surface beyond shrec16/test.py; this is
the serving entry point (PARITY.md "beyond the reference")."""

import csv
import json
import os

import numpy as np
import pytest

from sonet_tpu.config import tiny_test, load_config
from sonet_tpu.train.trainer import Trainer


def _load_infer():
    from sonet_tpu.tasks import infer
    return infer


pytestmark = pytest.mark.slow  # infer e2e suite: full gate only


def test_infer_classify_roundtrip(tmp_path):
    cfg = tiny_test().replace(checkpoints_dir=str(tmp_path),
                              name="infer_run", epochs=2)
    trainer = Trainer(cfg, quiet=True, resume=False)
    trainer.fit()
    run_dir = trainer.out_dir
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    # config roundtrip
    cfg2 = load_config(os.path.join(run_dir, "config.json"))
    assert cfg2.task == "classify" and cfg2.node_num == cfg.node_num

    infer = _load_infer()
    summary = infer.main(["--run", run_dir])
    assert summary["items"] > 0
    assert 0.0 <= summary["accuracy"] <= 1.0

    out = os.path.join(run_dir, "infer")
    with open(os.path.join(out, "predictions.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["index", "label", "pred", "correct"]
    assert len(rows) - 1 == summary["items"]
    # accuracy in summary must equal the csv mean
    correct = np.mean([int(r[3]) for r in rows[1:]])
    assert abs(correct - summary["accuracy"]) < 1e-6
    with open(os.path.join(out, "summary.json")) as f:
        assert json.load(f)["items"] == summary["items"]

    # --- mesh-sharded serving: same run, 4x2 device mesh, identical
    # per-item predictions (state replicated, batch sharded) ----------
    summary_mesh = infer.main(["--run", run_dir, "--mesh_shape", "4,2",
                               "--out", str(tmp_path / "infer_mesh")])
    assert summary_mesh["items"] == summary["items"]
    with open(tmp_path / "infer_mesh" / "predictions.csv") as f:
        rows_mesh = list(csv.reader(f))
    # argmax predictions are integer-stable under resharding
    assert [r[2] for r in rows_mesh[1:]] == [r[2] for r in rows[1:]]
    assert abs(summary_mesh["accuracy"] - summary["accuracy"]) < 1e-6


def test_infer_mesh_segment_and_autoencode(tmp_path):
    """Mesh-sharded serving must cover every task family, not just
    classify: per-item metrics identical to single-device."""
    infer = _load_infer()
    for task, key in (("segment", "iou"), ("autoencode", "loss")):
        cfg = tiny_test().replace(
            checkpoints_dir=str(tmp_path), name=f"infer_{task}",
            task=task, classes=50 if task == "segment" else 4,
            epochs=1, checkpoint_every=1)
        trainer = Trainer(cfg, quiet=True, resume=False)
        trainer.fit()
        s1 = infer.main(["--run", trainer.out_dir,
                         "--out", str(tmp_path / f"{task}_single")])
        s2 = infer.main(["--run", trainer.out_dir, "--mesh_shape", "4,2",
                         "--out", str(tmp_path / f"{task}_mesh")])
        assert s1["items"] == s2["items"] > 0
        assert abs(s1[key] - s2[key]) < 1e-4, (task, s1, s2)


def test_infer_mesh_divisibility_errors(tmp_path):
    import pytest
    cfg = tiny_test().replace(checkpoints_dir=str(tmp_path),
                              name="infer_div", epochs=1)
    trainer = Trainer(cfg, quiet=True, resume=False)
    trainer.fit()
    infer = _load_infer()
    with pytest.raises(SystemExit, match="batch_size"):
        # valid 8-device mesh, but batch 4 does not divide over data=8
        infer.main(["--run", trainer.out_dir, "--mesh_shape", "8,1"])
    with pytest.raises(SystemExit, match="mesh_shape"):
        infer.main(["--run", trainer.out_dir, "--mesh_shape", "4,2,1"])
    with pytest.raises(SystemExit, match="mesh_shape"):
        infer.main(["--run", trainer.out_dir, "--mesh_shape", "0,8"])
