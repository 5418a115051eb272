"""AOT serving-artifact export (sonet_tpu/serving.py + tasks/export.py).

Train a tiny run, export it with jax.export, reload the artifact
WITHOUT model code, and check numerical equality against the in-process
eval forward.  Beyond-reference capability (the reference's only
deployment path is .pth reloads inside its own codebase,
shrec16/test.py:31-32)."""

import json
import os

import numpy as np
import pytest

from sonet_tpu.config import tiny_test, load_config
from sonet_tpu.serving import (build_serve_fn, export_run, input_signature,
                               load_exported)
from sonet_tpu.train.trainer import Trainer




def _train_tiny(tmp_path, **overrides):
    cfg = tiny_test().replace(checkpoints_dir=str(tmp_path), epochs=1,
                              checkpoint_every=1, **overrides)
    trainer = Trainer(cfg, quiet=True, resume=False)
    trainer.fit()
    return trainer.out_dir


def _direct_serve(run_dir, arrays):
    """The in-process eval forward, built the same way export_run builds
    the exported one (portable pooling path)."""
    import jax

    from sonet_tpu import train
    from sonet_tpu.models import build_model

    cfg = load_config(os.path.join(run_dir, "config.json"))
    cfg = cfg.replace(mesh_shape=(1, 1), pooling="scatter")
    model = build_model(cfg)
    example = tuple(np.zeros(s, d) for _, s, d in input_signature(cfg))
    state = train.init_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                             example)
    state = train.restore_checkpoint(
        train.latest_checkpoint(os.path.join(run_dir, "ckpt")), state)
    serve = build_serve_fn(model, cfg, state.params, state.batch_stats)
    return np.asarray(jax.jit(serve)(*arrays))


def _random_inputs(cfg, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for name, shape, dtype in input_signature(cfg):
        if name == "label":
            out.append(rng.randint(0, 16, shape).astype(dtype))
        else:
            out.append(rng.randn(*shape).astype(dtype))
    return tuple(out)


@pytest.mark.slow
class TestExportRoundtrip:
    def test_classify_export_matches_direct(self, tmp_path):
        run = _train_tiny(tmp_path, name="exp_cls")
        manifest = export_run(run, platforms=["cpu"])
        art = os.path.join(run, "export")
        assert os.path.exists(os.path.join(art, "model.stablehlo"))
        with open(os.path.join(art, "manifest.json")) as f:
            assert json.load(f)["task"] == "classify"
        assert manifest["pooling"] == "scatter"

        fn, m = load_exported(art)
        cfg = load_config(os.path.join(run, "config.json"))
        arrays = _random_inputs(cfg)
        got = np.asarray(fn(*arrays))
        want = _direct_serve(run, arrays)
        assert got.shape == (cfg.batch_size, cfg.classes)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

        # wrong arity / wrong shape are caught before dispatch
        with pytest.raises(ValueError, match="expected 3 inputs"):
            fn(arrays[0])
        with pytest.raises(ValueError, match="expected shape"):
            fn(arrays[0][:, :-1], arrays[1], arrays[2])

    def test_segment_and_autoencode_export(self, tmp_path):
        for task, classes in (("segment", 50), ("autoencode", 4)):
            run = _train_tiny(tmp_path, name=f"exp_{task}", task=task,
                              classes=classes)
            export_run(run, platforms=["cpu"])
            fn, m = load_exported(os.path.join(run, "export"))
            cfg = load_config(os.path.join(run, "config.json"))
            arrays = _random_inputs(cfg)
            got = np.asarray(fn(*arrays))
            want = _direct_serve(run, arrays)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
            if task == "segment":
                assert [i["name"] for i in m["inputs"]] == [
                    "pc", "sn", "node", "label"]
                assert got.shape == (cfg.batch_size, cfg.input_pc_num,
                                     cfg.classes)
            else:
                assert got.shape[0] == cfg.batch_size and got.shape[2] == 3

    def test_poly_batch_export(self, tmp_path):
        """Symbolic-batch artifact: one export, any request batch size."""
        run = _train_tiny(tmp_path, name="exp_poly")
        manifest = export_run(run, platforms=["cpu"], poly_batch=True)
        assert manifest["poly_batch"]
        assert manifest["inputs"][0]["shape"][0] is None
        assert manifest["pooling"] == "scatter"
        fn, m = load_exported(os.path.join(run, "export"))
        cfg = load_config(os.path.join(run, "config.json"))
        full = _random_inputs(cfg)
        want = _direct_serve(run, full)
        for B in (1, 3, cfg.batch_size):
            got = np.asarray(fn(*(a[:B] for a in full)))
            np.testing.assert_allclose(got, want[:B], rtol=1e-5, atol=1e-5)
        # inconsistent leading dims are caught before dispatch
        with pytest.raises(ValueError, match="inconsistent batch"):
            fn(full[0][:2], full[1][:3], full[2][:2])

        # B=0 gives a clear error, not a symbolic-shape constraint one
        with pytest.raises(ValueError, match="empty request batch"):
            fn(*(a[:0] for a in full))

        # the ServingEngine pads poly requests to power-of-2 buckets
        # (bounds compile count) and slices the padding back off
        from sonet_tpu.serving import ServingEngine
        eng = ServingEngine.from_artifact(os.path.join(run, "export"))
        assert eng.batch_size is None
        got = eng.predict({"pc": full[0][:3], "sn": full[1][:3],
                           "node": full[2][:3]})
        np.testing.assert_allclose(got, want[:3], rtol=1e-5, atol=1e-5)
        assert eng.stats()["items"] == 3  # counts real rows, not padding

    def test_bucketed_poly_export(self, tmp_path):
        """Per-bucket fixed-shape blobs: any batch size WITHOUT symbolic
        shapes — the strategy that keeps the fast Pallas pooling kernel
        on TPU-only platform lists (exercised here with bucketed=True on
        cpu; the bucket machinery is platform-independent).  Cross-checks
        every bucket against the portable direct forward."""
        from sonet_tpu.serving import ServingEngine, batch_buckets

        assert batch_buckets(8) == [1, 2, 4, 8]
        assert batch_buckets(6) == [1, 2, 4, 6]
        assert batch_buckets(1) == [1]
        with pytest.raises(ValueError):
            batch_buckets(0)

        run = _train_tiny(tmp_path, name="exp_buck")
        manifest = export_run(run, platforms=["cpu"], poly_batch=True,
                              bucketed=True)
        cfg = load_config(os.path.join(run, "config.json"))
        want_buckets = batch_buckets(cfg.batch_size)
        assert manifest["buckets"] == want_buckets
        assert manifest["inputs"][0]["shape"][0] is None
        art = os.path.join(run, "export")
        for b, fname in manifest["blobs"].items():
            assert fname == f"model_b{b}.stablehlo"
            assert os.path.exists(os.path.join(art, fname))
        # no single-blob file in a bucketed artifact
        assert not os.path.exists(os.path.join(art, "model.stablehlo"))

        fn, m = load_exported(art)
        full = _random_inputs(cfg)
        want = _direct_serve(run, full)
        B_max = cfg.batch_size
        # exact bucket, padded-to-bucket, and chunked-above-largest sizes
        for B in (1, 3, B_max):
            got = np.asarray(fn(*(a[:B] for a in full)))
            np.testing.assert_allclose(got, want[:B], rtol=1e-5, atol=1e-5)
        big = tuple(np.concatenate([a, a[:3]]) for a in full)
        want_big = np.concatenate([want, want[:3]])
        got_big = np.asarray(fn(*big))
        np.testing.assert_allclose(got_big, want_big, rtol=1e-5, atol=1e-5)
        with pytest.raises(ValueError, match="empty request batch"):
            fn(*(a[:0] for a in full))

        # ServingEngine treats it as any-size and does NOT re-pad (fn
        # buckets internally)
        eng = ServingEngine.from_artifact(art)
        assert eng.batch_size is None
        got = eng.predict({"pc": full[0][:3], "sn": full[1][:3],
                           "node": full[2][:3]})
        np.testing.assert_allclose(got, want[:3], rtol=1e-5, atol=1e-5)
        assert eng.stats()["items"] == 3

    def test_export_cli(self, tmp_path):
        run = _train_tiny(tmp_path, name="exp_cli")
        from sonet_tpu.tasks import export as mod
        manifest = mod.main(["--run", run, "--platforms", "cpu",
                             "--batch_size", "2", "--check",
                             "--out", str(tmp_path / "art")])
        assert manifest["check"]["finite"]
        assert manifest["inputs"][0]["shape"][0] == 2
        assert manifest["check"]["output_shape"] == [2, 4]
