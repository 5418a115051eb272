"""End-to-end integration tests (SURVEY.md §4c): real train loops on
synthetic data, small enough for the CPU test box."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import config as cfg_mod
from sonet_tpu import models, train
from sonet_tpu.data import BatchLoader, SyntheticDataset


def _device_batch(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"}


def _train_some(cfg, steps=8, seed=0):
    model = models.build_model(cfg)
    ds = SyntheticDataset(cfg, size=cfg.batch_size * 4, seed=seed)
    loader = BatchLoader(ds, cfg.batch_size, seed=seed, num_threads=1)
    batch0 = _device_batch(next(iter(loader)))
    example = (batch0["pc"], batch0.get("sn"), batch0["node"],
               *((batch0["label"],) if cfg.task == "segment" else ()))
    state = train.init_state(model, cfg, jax.random.PRNGKey(seed), example,
                             steps_per_epoch=len(loader))
    train_step, eval_step = train.make_steps(model, cfg, len(loader))
    rng = jax.random.PRNGKey(seed + 1)
    eval_loss_before = float(eval_step(state, batch0)["loss"])
    losses = []
    it = iter(loader)
    for s in range(steps):
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        state, metrics = train_step(state, _device_batch(b), rng)
        losses.append(float(metrics["loss"]))
    eval_loss_after = float(eval_step(state, batch0)["loss"])
    return (state, model, losses, eval_step, loader,
            eval_loss_before, eval_loss_after)


class TestClassifyE2E:
    def test_loss_decreases_and_learns(self):
        cfg = cfg_mod.tiny_test()
        (state, model, losses, eval_step, loader,
         before, after) = _train_some(cfg, steps=16)
        assert np.isfinite(losses).all()
        # train loss is noisy (dropout 0.5, batch 4); eval loss on a fixed
        # batch must improve
        assert after < before, (before, after)
        # eval pass produces sane metrics
        m = eval_step(state, _device_batch(next(iter(loader))))
        assert 0.0 <= float(m["accuracy"]) <= 1.0
        assert np.isfinite(float(m["loss"]))

    def test_batch_stats_update(self):
        cfg = cfg_mod.tiny_test()
        state = _train_some(cfg, steps=2)[0]
        flat = jax.tree_util.tree_leaves(state.batch_stats)
        assert any(float(jnp.abs(x).sum()) > 0 for x in flat)

    def test_lr_schedule_halves_and_clips(self):
        # reference semantics: the halving is applied AFTER epoch e
        # finishes (e % step == 0, e > 0), so it takes effect from
        # epoch e+1 (modelnet/train.py:105-111; replayed exactly in
        # test_parity.TestTrainingTrajectoryParity)
        sched = train.halving_schedule(1e-3, 2, 0.5, 1e-5, steps_per_epoch=10)
        assert float(sched(jnp.asarray(0))) == pytest.approx(1e-3)
        assert float(sched(jnp.asarray(20))) == pytest.approx(1e-3)   # epoch 2
        assert float(sched(jnp.asarray(30))) == pytest.approx(5e-4)   # epoch 3
        assert float(sched(jnp.asarray(40))) == pytest.approx(5e-4)   # epoch 4
        assert float(sched(jnp.asarray(50))) == pytest.approx(2.5e-4)  # epoch 5
        assert float(sched(jnp.asarray(100_000))) == pytest.approx(1e-5)

    def test_point_dropout_shapes(self):
        pc = jnp.asarray(np.random.RandomState(0).randn(2, 32, 3),
                         jnp.float32)
        sn = jnp.asarray(np.random.RandomState(1).randn(2, 32, 3),
                         jnp.float32)
        pc2, sn2 = train.random_point_dropout(pc, sn, jax.random.PRNGKey(0),
                                              0.5)
        assert pc2.shape == pc.shape and sn2.shape == sn.shape
        # refilled slots duplicate kept points: every output point exists
        # in the input
        a = np.asarray(pc2[0])
        b = np.asarray(pc[0])
        d = np.abs(a[:, None] - b[None]).sum(-1).min(1)
        assert d.max() < 1e-6


class TestSegmentE2E:
    def test_one_step_and_iou(self):
        cfg = cfg_mod.tiny_test().replace(task="segment", classes=50)
        state, model, losses, eval_step, loader, *_ = _train_some(cfg,
                                                                  steps=3)
        assert np.isfinite(losses).all()
        m = eval_step(state, _device_batch(next(iter(loader))))
        assert 0.0 <= float(m["iou"]) <= 1.0
        assert m["score"].shape == (cfg.batch_size, cfg.input_pc_num, 50)


class TestAutoencodeE2E:
    def test_chamfer_decreases(self):
        cfg = cfg_mod.tiny_test().replace(
            task="autoencode", output_fc_pc_num=16, output_conv_pc_num=0)
        (state, model, losses, eval_step, loader,
         before, after) = _train_some(cfg, steps=12)
        assert np.isfinite(losses).all()
        assert after < before, (before, after)


@pytest.mark.slow
class TestCheckpoint:
    def test_checkpoint_every_periodic_saves(self, tmp_path):
        """--checkpoint_every N must save ungated every N steps (the flag
        was dead config: declared but never honored by Trainer.fit)."""
        from sonet_tpu.train.trainer import Trainer
        cfg = cfg_mod.tiny_test().replace(
            checkpoints_dir=str(tmp_path), name="periodic", epochs=2,
            checkpoint_every=1)
        t = Trainer(cfg, quiet=True, resume=False)
        # an impossible metric gate: only the periodic path may save
        t.fit(save_threshold=2.0)
        ckpt_dir = os.path.join(t.out_dir, "ckpt")
        assert train.latest_checkpoint(ckpt_dir) is not None

    def test_graceful_stop_checkpoints_and_resumes(self, tmp_path):
        """request_stop(): fit stops at the epoch boundary with an
        UNGATED checkpoint, and a fresh Trainer auto-resumes from it."""
        from sonet_tpu.train.trainer import Trainer
        cfg = cfg_mod.tiny_test().replace(
            checkpoints_dir=str(tmp_path), name="gstop", epochs=6)
        t = Trainer(cfg, quiet=True, resume=False)
        t.request_stop()
        t.fit(save_threshold=2.0)  # impossible gate: only the stop saves
        stopped_at = int(t.state.step)
        # host pipeline: per-step granularity — stops well short of the
        # 6 requested epochs
        assert 1 <= stopped_at <= t.steps_per_epoch
        latest = train.latest_checkpoint(os.path.join(t.out_dir, "ckpt"))
        assert latest is not None
        assert latest.endswith(f"step_{stopped_at:08d}")
        t2 = Trainer(cfg, quiet=True)  # resume=True default
        assert int(t2.state.step) == stopped_at

    def test_sigterm_graceful_stop(self, tmp_path):
        """A real SIGTERM mid-fit stops training cleanly with a
        checkpoint instead of killing the process (preemption safety;
        the reference dies losing all progress)."""
        import signal
        import threading
        from sonet_tpu.train.trainer import Trainer
        cfg = cfg_mod.tiny_test().replace(
            checkpoints_dir=str(tmp_path), name="sigterm", epochs=50)
        t = Trainer(cfg, quiet=True, resume=False)
        timer = threading.Timer(
            0.2, lambda: os.kill(os.getpid(), signal.SIGTERM))
        timer.start()
        try:
            t.fit(save_threshold=2.0)
        finally:
            timer.cancel()
        assert int(t.state.step) < 50 * t.steps_per_epoch
        assert train.latest_checkpoint(
            os.path.join(t.out_dir, "ckpt")) is not None
        # the previous SIGTERM disposition is restored after fit, and
        # the consumed stop flag is cleared (a later fit() must run)
        assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
        assert not t._stop_requested

    def test_training_is_seed_deterministic(self, tmp_path):
        """Two Trainers with the same config/seed produce identical
        metrics (data order, augmentation, dropout and init are all
        seed-derived; nothing depends on thread timing)."""
        from sonet_tpu.train.trainer import Trainer
        outs = []
        for tag in ("a", "b"):
            cfg = cfg_mod.tiny_test().replace(
                checkpoints_dir=str(tmp_path / tag), name="det", epochs=2)
            t = Trainer(cfg, quiet=True, resume=False)
            outs.append(t.fit(save_threshold=2.0))
        assert outs[0].keys() == outs[1].keys()
        for k in outs[0]:
            assert abs(outs[0][k] - outs[1][k]) < 1e-6, (k, outs)

    def test_latest_checkpoint_skips_crashed_save(self, tmp_path):
        """A crash during an orbax save leaves a staging dir
        (step_X.orbax-checkpoint-tmp-*); resume must pick the last
        FINALIZED checkpoint, and GC must not count the leftover."""
        root = tmp_path / "ckpt"
        (root / "step_00000010").mkdir(parents=True)
        (root / "step_00000020.orbax-checkpoint-tmp-1723").mkdir()
        got = train.latest_checkpoint(str(root))
        assert got == str(root / "step_00000010")
        from sonet_tpu.train.checkpoints import _gc
        (root / "step_00000005").mkdir()
        _gc(str(root), keep=2)  # both finalized dirs kept
        assert (root / "step_00000005").exists()
        assert (root / "step_00000010").exists()
        # ...and the dead staging dir is swept (full checkpoint size)
        assert not (root / "step_00000020.orbax-checkpoint-tmp-1723"
                    ).exists()
        # steps past 8 digits order numerically, not lexicographically
        (root / "step_100000000").mkdir()
        assert train.latest_checkpoint(str(root)).endswith(
            "step_100000000")

    def test_save_restore_roundtrip(self, tmp_path):
        cfg = cfg_mod.tiny_test()
        state, model, _, eval_step, loader, *_ = _train_some(cfg, steps=2)
        path = train.save_checkpoint(str(tmp_path / "ckpt"), state,
                                     int(state.step))
        # fresh state, restore, compare a forward pass
        batch = _device_batch(next(iter(loader)))
        example = (batch["pc"], batch["sn"], batch["node"])
        fresh = train.init_state(model, cfg, jax.random.PRNGKey(99), example,
                                 steps_per_epoch=4)
        restored = train.restore_checkpoint(path, fresh)
        a = eval_step(state, batch)
        b = eval_step(restored, batch)
        np.testing.assert_allclose(np.asarray(a["score"]),
                                   np.asarray(b["score"]), rtol=1e-5,
                                   atol=1e-5)

    def test_encoder_only_restore(self, tmp_path):
        cfg = cfg_mod.tiny_test()
        state, model, _, _, loader, *_ = _train_some(cfg, steps=2)
        path = train.save_checkpoint(str(tmp_path / "ckpt"), state,
                                     int(state.step))
        # transfer into a fresh classifier with different head init
        batch = _device_batch(next(iter(loader)))
        example = (batch["pc"], batch["sn"], batch["node"])
        fresh = train.init_state(model, cfg, jax.random.PRNGKey(7), example,
                                 steps_per_epoch=4)
        moved = train.restore_encoder(path, fresh)
        enc_a = jax.tree_util.tree_leaves(state.params["encoder"])
        enc_b = jax.tree_util.tree_leaves(moved.params["encoder"])
        for x, y in zip(enc_a, enc_b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
        # head params stay freshly initialized (different from trained)
        head_a = jax.tree_util.tree_leaves(state.params["classifier"])
        head_b = jax.tree_util.tree_leaves(moved.params["classifier"])
        assert any(not np.allclose(np.asarray(x), np.asarray(y))
                   for x, y in zip(head_a, head_b))
