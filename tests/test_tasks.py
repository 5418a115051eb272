"""Task-driver integration tests over fabricated on-disk datasets:
the MNIST (2D, no normals) and SHREC (val split + retrieval) paths."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import config as cfg_mod
from sonet_tpu.train.trainer import Trainer


def _fake_mnist_root(tmp_path, n=24):
    rng = np.random.default_rng(0)
    imgs = np.zeros((n, 28, 28), np.uint8)
    for i in range(n):
        lab = i % 4
        r0, c0 = 4 + 2 * lab, 4 + 3 * lab
        imgs[i, r0:r0 + 8, c0:c0 + 8] = 255
    labels = (np.arange(n) % 4).astype(np.uint8)
    np.savez(tmp_path / "mnist.npz", x_train=imgs, y_train=labels,
             x_test=imgs[:8], y_test=labels[:8])
    return str(tmp_path)


class TestMNISTTask:
    @pytest.mark.slow
    def test_trainer_mnist_2d(self, tmp_path):
        root = _fake_mnist_root(tmp_path)
        cfg = cfg_mod.mnist().replace(
            dataroot=root, classes=4, batch_size=4, input_pc_num=32,
            node_num=9, k=2, som_k=4, feature_num=32, dropout=0.0,
            epochs=1, checkpoints_dir=str(tmp_path / "ckpt"),
            name="mnist_t")
        trainer = Trainer(cfg, quiet=True, resume=False)
        metrics = trainer.fit(epochs=1)
        assert np.isfinite(metrics["loss"])
        assert 0.0 <= metrics["accuracy"] <= 1.0


def _fake_shrec_root(tmp_path, cfg, n_train=8, n_val=4, n_test=4):
    rows = cfg.rows
    rng = np.random.default_rng(1)
    root = tmp_path / "shrec"
    cats = [f"cat{i}" for i in range(cfg.classes)]
    (root).mkdir()
    (root / "category.txt").write_text("\n".join(cats) + "\n")
    counts = {"train": n_train, "val": n_val, "test": n_test}
    idx = 0
    for mode, n in counts.items():
        lines = []
        os.makedirs(root / f"{rows}x{rows}" / mode, exist_ok=True)
        for i in range(n):
            name = f"{idx:06d}"
            idx += 1
            cat = cats[i % len(cats)]
            np.savez(root / f"{rows}x{rows}" / mode / f"model_{name}.npz",
                     pc=rng.standard_normal((60, 3)).astype(np.float32),
                     sn=rng.standard_normal((60, 3)).astype(np.float32),
                     som_node=rng.standard_normal(
                         (cfg.node_num, 3)).astype(np.float32))
            lines.append(f"{name},{cat}" if mode != "test" else name)
        (root / f"{mode}.txt").write_text("\n".join(lines) + "\n")
    return str(root)


class TestShrecTask:
    @pytest.mark.slow
    def test_trainer_val_split_and_retrieval(self, tmp_path):
        cfg = cfg_mod.shrec16().replace(
            classes=3, batch_size=4, input_pc_num=32, node_num=9, k=2,
            som_k=0, feature_num=32, dropout=0.0, epochs=1,
            checkpoints_dir=str(tmp_path / "ckpt"), name="shrec_t")
        root = _fake_shrec_root(tmp_path, cfg)
        cfg = cfg.replace(dataroot=root)
        trainer = Trainer(cfg, quiet=True, resume=False)
        metrics = trainer.fit(epochs=1)  # eval on 'val' split
        assert np.isfinite(metrics["loss"])

        # retrieval over the test split using the trained state
        from sonet_tpu import retrieval
        from sonet_tpu.data.pipeline import BatchLoader
        from sonet_tpu.train.trainer import build_dataset
        test_set = build_dataset(cfg, "test")
        loader = BatchLoader(test_set, cfg.batch_size, shuffle=False,
                             drop_last=False, pad_last=True)

        def device_batch(b):
            return {k: jnp.asarray(v) for k, v in b.items()
                    if k != "valid"}

        scores, labels, ids = retrieval.extract_scores(trainer.eval_step,
                                                       trainer.state, loader,
                                                       device_batch)
        assert labels.shape == (4,)
        assert scores.shape == (4, 3)
        results = retrieval.rank_all(scores)
        out = tmp_path / "rank"
        retrieval.write_rank_files(results, ids, str(out))
        files = sorted(os.listdir(out))
        assert len(files) == 4
        # ids are the real shrec model names from the test split
        assert files[0] == "%06d" % int(ids[0])
