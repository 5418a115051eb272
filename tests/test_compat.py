"""Reference ``.pth`` checkpoint import (sonet_tpu/compat.py).

Builds the actual torch reference modules (same machinery as
test_parity.py), saves their ``state_dict()`` to ``.pth`` files exactly
as the reference's ``save_network`` does (models/classifier.py:127-133),
and checks the key-driven converter reproduces the SAME parameter trees
as the module-driven transplant that test_parity.py pins numerically
against reference forward passes — then that ``import_run`` writes a
run directory the normal serving path accepts."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import test_parity as tp
from sonet_tpu import compat


def _save_sd(module, path):
    """Exactly the reference's save format (classifier.py:127-133)."""
    torch.save(module.cpu().state_dict(), path)
    return str(path)


def _assert_trees_equal(got, want, label):
    gl = jax.tree_util.tree_flatten_with_path(got)[0]
    wl = jax.tree_util.tree_flatten_with_path(want)[0]
    gk = [jax.tree_util.keystr(k) for k, _ in gl]
    wk = [jax.tree_util.keystr(k) for k, _ in wl]
    assert gk == wk, f"{label}: tree structure differs\n{gk}\nvs\n{wk}"
    for (k, g), (_, w) in zip(gl, wl):
        np.testing.assert_array_equal(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            err_msg=f"{label}{jax.tree_util.keystr(k)}")


class TestConverters:
    def test_encoder_matches_transplant(self, ref, tmp_path):
        cfg = tp._cfg()
        tenc = ref.Encoder(tp.VirtualOpt(cfg))
        tp._randomize_torch(tenc, 21)
        want_p, want_s = tp._encoder_transplant(tenc, cfg)
        sd = compat.load_state_dict(
            _save_sd(tenc, tmp_path / "e_net_encoder.pth"))
        # the dead transformer's weights are in the file and must be
        # dropped (networks.py:78, usage commented out at 147-164)
        got_p, got_s = compat.convert_encoder(sd)
        _assert_trees_equal(got_p, want_p, "params")
        _assert_trees_equal(got_s, want_s, "batch_stats")

    def test_encoder_som_k0_shape(self, ref, tmp_path):
        """som_k < 2: no knnlayer, 4-layer PointResNet final_pointnet."""
        cfg = tp._cfg().replace(som_k=0)
        tenc = ref.Encoder(tp.VirtualOpt(cfg))
        tp._randomize_torch(tenc, 22)
        sd = compat.load_state_dict(
            _save_sd(tenc, tmp_path / "e0_net_encoder.pth"))
        got_p, got_s = compat.convert_encoder(sd)
        assert "knnlayer" not in got_p
        want_p, want_s = tp._encoder_transplant(tenc, cfg)
        _assert_trees_equal(got_p, want_p, "params")
        _assert_trees_equal(got_s, want_s, "batch_stats")

    def test_classifier_matches_transplant(self, ref, tmp_path):
        cfg = tp._cfg()
        tcls = ref.Classifier(tp.VirtualOpt(cfg))
        tp._randomize_torch(tcls, 23)
        want_p, want_s = tp._classifier_transplant(tcls)
        sd = compat.load_state_dict(
            _save_sd(tcls, tmp_path / "c_net_classifier.pth"))
        got_p, got_s = compat.convert_classifier(sd)
        _assert_trees_equal(got_p, want_p, "params")
        _assert_trees_equal(got_s, want_s, "batch_stats")

    def test_segmenter_matches_transplant(self, ref, tmp_path):
        cfg = tp._cfg().replace(task="segment", classes=7)
        tseg = ref.Segmenter(tp.VirtualOpt(cfg))
        tp._randomize_torch(tseg, 24)
        want_p, want_s = {}, {}
        for i, (tl, has_norm) in enumerate(
                [(tseg.layer1, True), (tseg.layer2, True),
                 (tseg.layer3, True), (tseg.layer4, True),
                 (tseg.layer5, False)], start=1):
            p, s = tp._point_layer(tl, has_norm)
            want_p[f"layer{i}"] = p
            if s:
                want_s[f"layer{i}"] = s
        sd = compat.load_state_dict(
            _save_sd(tseg, tmp_path / "s_net_segmenter.pth"))
        got_p, got_s = compat.convert_segmenter(sd)
        _assert_trees_equal(got_p, want_p, "params")
        _assert_trees_equal(got_s, want_s, "batch_stats")

    def test_decoder_spot_values(self, ref, tmp_path):
        """Decoder conversion: exact leaf values against the torch
        weights through the documented transforms (the same transforms
        test_parity.py::test_decoder_conv_parity pins numerically)."""
        cfg = tp._cfg()
        tdec = ref.Decoder(tp.VirtualOpt(cfg))
        tp._randomize_torch(tdec, 25)
        sd = compat.load_state_dict(
            _save_sd(tdec, tmp_path / "d_net_decoder.pth"))
        got_p, got_s = compat.convert_decoder(sd)

        w = tdec.fc_decoder.linear1.linear.weight.detach().numpy()
        np.testing.assert_array_equal(
            got_p["fc_decoder"]["PointLayer_0"]["Dense_0"]["kernel"], w.T)
        np.testing.assert_array_equal(
            got_p["fc_decoder"]["linear_out"]["bias"],
            tdec.fc_decoder.linear_out.linear.bias.detach().numpy())
        w = tdec.conv_decoder.deconv1.conv.conv.weight.detach().numpy()
        np.testing.assert_array_equal(
            got_p["conv_decoder"]["UpConv_0"]["Conv_0"]["kernel"],
            w.transpose(2, 3, 1, 0))
        np.testing.assert_array_equal(
            got_s["conv_decoder"]["UpConv_2"]["BatchNorm_0"]["var"],
            tdec.conv_decoder.deconv3.conv.norm.running_var.detach().numpy())
        w = tdec.conv_decoder.conv2pc5.conv2.conv.weight.detach().numpy()
        np.testing.assert_array_equal(
            got_p["conv_decoder"]["ConvToPC_1"]["Dense_0"]["kernel"],
            w.reshape(3, -1).T)

    def test_wrong_file_rejected(self, ref, tmp_path):
        cfg = tp._cfg()
        tcls = ref.Classifier(tp.VirtualOpt(cfg))
        sd = compat.load_state_dict(
            _save_sd(tcls, tmp_path / "x_net_classifier.pth"))
        with pytest.raises(ValueError, match="not an encoder"):
            compat.convert_encoder(sd)
        with pytest.raises(ValueError, match="not a segmenter"):
            compat.convert_segmenter(sd)
        with pytest.raises(ValueError, match="not a decoder"):
            compat.convert_decoder(sd)


class TestImportRun:
    @pytest.fixture(scope="class")
    def pth_files(self, ref, tmp_path_factory):
        cfg = tp._cfg()
        d = tmp_path_factory.mktemp("ref_ckpts")
        tenc = ref.Encoder(tp.VirtualOpt(cfg))
        tcls = ref.Classifier(tp.VirtualOpt(cfg))
        tp._randomize_torch(tenc, 31)
        tp._randomize_torch(tcls, 32)
        return cfg, {"encoder": _save_sd(tenc, d / "9_net_encoder.pth"),
                     "classifier": _save_sd(tcls, d / "9_net_classifier.pth")}

    def test_variables_match_model_init(self, pth_files):
        cfg, files = pth_files
        variables = compat.import_reference_checkpoint(cfg, files)
        assert set(variables["params"]) == {"encoder", "classifier"}

    def test_file_set_validation(self, pth_files):
        cfg, files = pth_files
        with pytest.raises(ValueError, match="missing"):
            compat.import_reference_checkpoint(
                cfg, {"encoder": files["encoder"]})
        with pytest.raises(ValueError, match="unexpected"):
            compat.import_reference_checkpoint(
                cfg, {**files, "decoder": files["classifier"]})
        # architecture mismatch: clear per-leaf shape report
        with pytest.raises(ValueError, match="does not fit"):
            compat.import_reference_checkpoint(cfg.replace(classes=9), files)

    @pytest.mark.slow
    def test_import_run_servable(self, pth_files, tmp_path):
        """import_run writes a run directory the standard entry points
        accept: restore + ServingEngine round-trip with the imported
        weights intact."""
        cfg, files = pth_files
        out = str(tmp_path / "imported")
        ckpt = compat.import_run(cfg, files, out)
        assert os.path.exists(os.path.join(out, "config.json"))
        assert os.path.isdir(ckpt)

        from sonet_tpu.serving import ServingEngine
        eng = ServingEngine.from_run(out)
        x = {i["name"]: np.random.RandomState(3).randn(
                2, *i["shape"][1:]).astype(i["dtype"])
             for i in eng.manifest["inputs"]}
        got = eng.predict(x)
        assert got.shape == (2, cfg.classes)
        assert np.isfinite(got).all()

        # the weights in the restored state are the converted ones
        import sonet_tpu.train as train
        from sonet_tpu.config import load_config
        from sonet_tpu.models import build_model
        from sonet_tpu.serving import input_signature
        rcfg = load_config(os.path.join(out, "config.json"))
        model = build_model(rcfg)
        example = tuple(jnp.zeros(s, d)
                        for _, s, d in input_signature(rcfg))
        state = train.init_state(model, rcfg, jax.random.PRNGKey(0), example)
        state = train.restore_checkpoint(ckpt, state)
        variables = compat.import_reference_checkpoint(rcfg, files)
        _assert_trees_equal(state.params, variables["params"], "restored")

    def test_import_run_step_payload_matches_dir(self, pth_files, tmp_path):
        """--step N: the saved state's step must equal N (a step-0
        payload under step_N would make post-import training saves at
        step < N invisible to resume)."""
        import jax
        import jax.numpy as jnp
        import sonet_tpu.train as train
        from sonet_tpu.models import build_model
        from sonet_tpu.serving import input_signature
        cfg, files = pth_files
        out = str(tmp_path / "stepped")
        ckpt = compat.import_run(cfg, files, out, step=300)
        assert ckpt.endswith("step_00000300")
        model = build_model(cfg)
        example = tuple(jnp.zeros(s, d) for _, s, d in input_signature(cfg))
        state = train.init_state(model, cfg, jax.random.PRNGKey(0), example)
        state = train.restore_checkpoint(ckpt, state)
        assert int(state.step) == 300

    def test_pth_roundtrip(self, ref, pth_files, tmp_path):
        """import -> run dir -> export_reference_checkpoint reproduces
        the original .pth contents bit-for-bit, and the exported files
        load back into fresh reference modules (strict=False covers
        only the dead transformer)."""
        cfg, files = pth_files
        run = str(tmp_path / "rt")
        compat.import_run(cfg, files, run)
        paths = compat.export_reference_checkpoint(
            run, out_dir=str(tmp_path / "pth_out"))
        assert set(paths) == {"encoder", "classifier"}

        for label in ("encoder", "classifier"):
            orig = compat.load_state_dict(files[label])
            redo = compat.load_state_dict(paths[label])
            # transformer weights are not representable here (dead code)
            orig = {k: v for k, v in orig.items()
                    if not k.startswith("transformer.")}
            assert set(redo) == set(orig), label
            for k in orig:
                np.testing.assert_array_equal(redo[k], orig[k],
                                              err_msg=f"{label}.{k}")

        # fresh reference modules accept the exported files
        tenc = ref.Encoder(tp.VirtualOpt(cfg))
        missing, unexpected = tenc.load_state_dict(
            torch.load(paths["encoder"], weights_only=True), strict=False)
        assert not unexpected
        assert all(k.startswith("transformer.") for k in missing), missing
        tcls = ref.Classifier(tp.VirtualOpt(cfg))
        tcls.load_state_dict(torch.load(paths["classifier"],
                                        weights_only=True))  # strict

    @pytest.mark.slow
    def test_pth_roundtrip_decoder_segmenter(self, ref, tmp_path):
        """Same round-trip through the decoder and segmenter heads."""
        for task, label, build in (
                ("autoencode", "decoder", ref.Decoder),
                ("segment", "segmenter", ref.Segmenter)):
            cfg = tp._cfg().replace(
                task=task, classes=(7 if task == "segment" else 5))
            mod = build(tp.VirtualOpt(cfg))
            tp._randomize_torch(mod, 51)
            pth = str(tmp_path / f"1_net_{label}.pth")
            torch.save(mod.cpu().state_dict(), pth)
            run = str(tmp_path / f"rt_{label}")
            enc = ref.Encoder(tp.VirtualOpt(cfg))
            tp._randomize_torch(enc, 52)
            encp = str(tmp_path / f"1_net_encoder_{label}.pth")
            torch.save(enc.cpu().state_dict(), encp)
            compat.import_run(cfg, {"encoder": encp, label: pth}, run)
            paths = compat.export_reference_checkpoint(
                run, out_dir=str(tmp_path / f"out_{label}"))
            orig = compat.load_state_dict(pth)
            redo = compat.load_state_dict(paths[label])
            assert set(redo) == set(orig), label
            for k in orig:
                np.testing.assert_array_equal(redo[k], orig[k],
                                              err_msg=f"{label}.{k}")
            fresh = build(tp.VirtualOpt(cfg))
            fresh.load_state_dict(torch.load(paths[label],
                                             weights_only=True))  # strict

    def test_import_cli(self, pth_files, tmp_path):
        cfg, files = pth_files
        from sonet_tpu.tasks import import_ckpt as mod
        out = str(tmp_path / "cli_imported")
        summary = mod.main([
            "--encoder", files["encoder"],
            "--classifier", files["classifier"],
            "--out", out, "--preset", "tiny_test",
            # override the preset to the architecture the .pth was
            # trained with (tp._cfg())
            "--classes", str(cfg.classes),
            "--batch_size", str(cfg.batch_size),
            "--input_pc_num", str(cfg.input_pc_num),
            "--surface_normal", "true",
            "--feature_num", str(cfg.feature_num),
            "--node_num", str(cfg.node_num),
            "--k", str(cfg.k), "--som_k", str(cfg.som_k),
            "--som_k_type", cfg.som_k_type,
            "--dropout", str(cfg.dropout),
            "--output_fc_pc_num", str(cfg.output_fc_pc_num),
            "--output_conv_pc_num", str(cfg.output_conv_pc_num),
        ])
        assert summary["task"] == "classify"
        assert os.path.isdir(summary["checkpoint"])


# reuse test_parity's reference import fixture at module scope here too
@pytest.fixture(scope="module")
def ref():
    import importlib
    import sys
    import types
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.modules.setdefault("index_max", tp._index_max_stub())
    sys.path.insert(0, "/root/reference")
    try:
        networks = importlib.import_module("models.networks")
    finally:
        sys.path.pop(0)
    return networks
