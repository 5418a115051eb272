"""Network module tests: shapes, channel plans, BN semantics, gradient
boundaries (SURVEY.md §4a/b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import config as cfg_mod
from sonet_tpu import nn as snn


def tiny():
    return cfg_mod.tiny_test()


def make_inputs(cfg, seed=0, dim=3):
    rs = np.random.RandomState(seed)
    B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
    pc = jnp.asarray(rs.randn(B, N, dim).astype(np.float32))
    sn = jnp.asarray(rs.randn(B, N, dim).astype(np.float32))
    node = jnp.asarray(rs.randn(B, M, dim).astype(np.float32))
    return pc, sn, node


class TestBatchNorm:
    def test_normalizes_and_tracks_stats(self):
        bn = snn.BatchNorm(momentum=0.5)
        x = jnp.asarray(np.random.RandomState(0).randn(8, 16, 4) * 3 + 7,
                        jnp.float32)
        vs = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        y, mut = bn.apply(vs, x, use_running_average=False,
                          mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(jnp.mean(y, (0, 1))),
                                   np.zeros(4), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.std(y, (0, 1))),
                                   np.ones(4), atol=1e-3)
        # torch momentum convention: ra = (1-m)*ra + m*batch
        ra_mean = np.asarray(mut["batch_stats"]["mean"])
        np.testing.assert_allclose(ra_mean, 0.5 * 0 + 0.5 * np.asarray(
            jnp.mean(x, (0, 1))), rtol=1e-5)

    def test_momentum_decay_schedule(self):
        bn = snn.BatchNorm(momentum=0.1, momentum_decay_step=2,
                           momentum_decay=0.5)
        x = jnp.ones((4, 3)) * 2.0
        vs = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        # epoch 4 -> m = 0.1 * 0.5^(4//2) = 0.025
        _, mut = bn.apply(vs, x, use_running_average=False,
                          epoch=jnp.asarray(4.0), mutable=["batch_stats"])
        ra = float(mut["batch_stats"]["mean"][0])
        np.testing.assert_allclose(ra, 0.025 * 2.0, rtol=1e-5)
        # clamp at 0.01: epoch 100 -> decayed << 0.01 -> 0.01
        _, mut = bn.apply(vs, x, use_running_average=False,
                          epoch=jnp.asarray(100.0), mutable=["batch_stats"])
        np.testing.assert_allclose(float(mut["batch_stats"]["mean"][0]),
                                   0.01 * 2.0, rtol=1e-5)

    def test_eval_uses_running_stats(self):
        bn = snn.BatchNorm()
        x = jnp.asarray(np.random.RandomState(1).randn(4, 3), jnp.float32)
        vs = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        y = bn.apply(vs, x, use_running_average=True)
        # fresh stats: mean 0 var 1 -> identity (scale 1 bias 0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4,
                                   atol=1e-5)


class TestDenseBNBias:
    def test_bias_grad_zero_under_batchnorm(self):
        """Bias before train-mode BN is inert (mean subtraction cancels
        it); its gradient is stop_gradiented to zero (PARITY.md)."""
        layer = snn.PointLayer(8, activation="relu", normalization="batch")
        x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 6),
                        jnp.float32)
        vs = layer.init(jax.random.PRNGKey(0), x, train=True)

        def loss(params):
            y, _ = layer.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * y)

        g = jax.grad(loss)(vs["params"])
        np.testing.assert_array_equal(
            np.asarray(g["Dense_0"]["bias"]), 0.0)
        assert float(jnp.abs(g["Dense_0"]["kernel"]).max()) > 0.0

    def test_bias_add_still_live_in_eval(self):
        """The forward add is kept: eval-mode BN uses running stats, so
        shifting the bias shifts the output."""
        layer = snn.PointLayer(8, activation=None, normalization="batch")
        x = jnp.asarray(np.random.RandomState(1).randn(4, 16, 6),
                        jnp.float32)
        vs = layer.init(jax.random.PRNGKey(0), x, train=True)
        y0 = layer.apply(vs, x, train=False)
        shifted = jax.tree_util.tree_map(lambda a: a, vs["params"])
        shifted["Dense_0"]["bias"] = shifted["Dense_0"]["bias"] + 1.0
        y1 = layer.apply({"params": shifted,
                          "batch_stats": vs["batch_stats"]}, x, train=False)
        assert float(jnp.abs(y1 - y0).max()) > 0.1

    def test_bias_grad_nonzero_without_norm(self):
        layer = snn.PointLayer(8, activation=None, normalization=None)
        x = jnp.asarray(np.random.RandomState(2).randn(4, 16, 6),
                        jnp.float32)
        vs = layer.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(layer.apply({"params": params}, x) ** 2)

        g = jax.grad(loss)(vs["params"])
        assert float(jnp.abs(g["Dense_0"]["bias"]).max()) > 0.0


class TestLayers:
    def test_pointresnet_channel_plan(self):
        """final layer consumes concat(out0, out[k-2]) (layers.py:416)."""
        m = snn.PointResNet((8, 16, 32, 24), normalization=None)
        x = jnp.ones((2, 5, 6))
        vs = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vs, x)
        assert y.shape == (2, 5, 24)
        # last dense kernel input dim = 8 (out0) + 32 (out[k-2]) = 40
        last = vs["params"]["PointLayer_3"]["Dense_0"]["kernel"]
        assert last.shape == (40, 24)

    def test_pointnet_last_layer_linear(self):
        m = snn.PointNetMLP((8, 16), normalization="batch")
        x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 3), jnp.float32)
        vs = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vs, x)
        # last layer has no relu: negative values exist
        assert float(jnp.min(y)) < 0

    def test_knn_module(self):
        m = snn.KNNModule((8, 12), normalization=None)
        rs = np.random.RandomState(2)
        coord = jnp.asarray(rs.randn(2, 6, 3), jnp.float32)
        feat = jnp.asarray(rs.randn(2, 6, 4), jnp.float32)
        idx = jnp.asarray(rs.randint(0, 6, (2, 6, 3)))
        vs = m.init(jax.random.PRNGKey(0), coord, feat, idx, "avg")
        center, out = m.apply(vs, coord, feat, idx, "avg")
        assert center.shape == (2, 6, 3) and out.shape == (2, 6, 12)
        c2, _ = m.apply(vs, coord, feat, idx, "center")
        np.testing.assert_allclose(np.asarray(c2), np.asarray(coord))

    def test_knn_center_stop_gradient(self):
        """decentering is detached (layers.py:351-352)."""
        m = snn.KNNModule((4,), normalization=None)
        rs = np.random.RandomState(3)
        coord = jnp.asarray(rs.randn(1, 4, 3), jnp.float32)
        feat = jnp.asarray(rs.randn(1, 4, 2), jnp.float32)
        idx = jnp.asarray(rs.randint(0, 4, (1, 4, 2)))
        vs = m.init(jax.random.PRNGKey(0), coord, feat, idx, "avg")

        def f(c):
            center, out = m.apply(vs, c, feat, idx, "avg")
            return jnp.sum(out) + jnp.sum(center)

        g = jax.grad(f)(coord)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)

    def test_upconv_doubles_spatial(self):
        m = snn.UpConv(8, normalization=None)
        x = jnp.ones((2, 4, 4, 16))
        vs = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(vs, x).shape == (2, 8, 8, 8)


class TestEncoder:
    def test_shapes_and_occupancy(self):
        cfg = tiny()
        enc = snn.Encoder(cfg)
        pc, sn, node = make_inputs(cfg)
        vs = enc.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
        out = enc.apply(vs, pc, sn, node, train=False)
        B, N, M, k, F = (cfg.batch_size, cfg.input_pc_num, cfg.node_num,
                         cfg.k, cfg.feature_num)
        assert out.feature.shape == (B, F)
        assert out.min_idx.shape == (B, k * N)
        assert out.first_pn_out.shape == (B, k * N, 384)
        assert out.first_pn_out_masked_max.shape == (B, M, 384)
        assert out.final_pn_out.shape == (B, M, F)
        assert out.som_node.shape == (B, M, 3)
        # global feature is max over nodes
        np.testing.assert_allclose(np.asarray(out.feature),
                                   np.asarray(jnp.max(out.final_pn_out, 1)),
                                   rtol=1e-6)

    def test_default_node_knn_matches_reference_semantics(self):
        """node_knn_I=None must build the kNN graph on the INPUT SOM
        nodes (pre-recentering), exactly like the reference's loader-side
        Faiss kNN (modelnet_shrec_loader.py:257-261) — VERDICT r1 #5."""
        from sonet_tpu.ops import knn

        cfg = tiny()
        enc = snn.Encoder(cfg)
        pc, sn, node = make_inputs(cfg)
        vs = enc.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
        out_default = enc.apply(vs, pc, sn, node, train=False)
        ref_I = knn(node, cfg.som_k)  # what the reference loader provides
        out_ref = enc.apply(vs, pc, sn, node, ref_I, train=False)
        np.testing.assert_array_equal(np.asarray(out_default.feature),
                                      np.asarray(out_ref.feature))

    def test_som_k_0_branch(self):
        cfg = tiny().replace(som_k=0)
        enc = snn.Encoder(cfg)
        pc, sn, node = make_inputs(cfg)
        vs = enc.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
        out = enc.apply(vs, pc, sn, node, train=False)
        assert out.knn_feature is None
        assert out.feature.shape == (cfg.batch_size, cfg.feature_num)

    def test_no_surface_normal_2d(self):
        """MNIST-style 2D clouds without normals (SURVEY.md §2.1 caveat)."""
        cfg = tiny().replace(surface_normal=False)
        enc = snn.Encoder(cfg)
        pc, _, node = make_inputs(cfg, dim=2)
        vs = enc.init(jax.random.PRNGKey(0), pc, None, node, train=False)
        out = enc.apply(vs, pc, None, node, train=False)
        assert out.feature.shape == (cfg.batch_size, cfg.feature_num)
        assert out.som_node.shape[-1] == 2

    def test_geometry_stop_gradients(self):
        """centers / decentering are detached (networks.py:169-171)."""
        cfg = tiny()
        enc = snn.Encoder(cfg)
        pc, sn, node = make_inputs(cfg)
        vs = enc.init(jax.random.PRNGKey(0), pc, sn, node, train=False)

        def f(node):
            return jnp.sum(enc.apply(vs, pc, sn, node, train=False).centers)

        g = jax.grad(f)(node)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


class TestHeads:
    def test_classifier(self):
        cfg = tiny()
        head = snn.ClassifierHead(cfg)
        f = jnp.asarray(np.random.RandomState(0).randn(4, cfg.feature_num),
                        jnp.float32)
        vs = head.init(jax.random.PRNGKey(0), f, train=False)
        logits = head.apply(vs, f, train=False)
        assert logits.shape == (4, cfg.classes)

    def test_classifier_dropout_train_stochastic(self):
        cfg = tiny().replace(dropout=0.7)
        head = snn.ClassifierHead(cfg)
        f = jnp.asarray(np.random.RandomState(5).randn(4, cfg.feature_num),
                        jnp.float32)
        vs = head.init(jax.random.PRNGKey(0), f, train=False)
        a = head.apply(vs, f, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])[0]
        b = head.apply(vs, f, train=True,
                       rngs={"dropout": jax.random.PRNGKey(2)},
                       mutable=["batch_stats"])[0]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_segmenter_shapes(self):
        cfg = tiny().replace(task="segment", classes=50)
        enc = snn.Encoder(cfg)
        seg = snn.SegmenterHead(cfg)
        pc, sn, node = make_inputs(cfg)
        label = jnp.zeros((cfg.batch_size,), jnp.int32)
        evs = enc.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
        out = enc.apply(evs, pc, sn, node, train=False)
        svs = seg.init(jax.random.PRNGKey(1), out, label, train=False)
        score = seg.apply(svs, out, label, train=False)
        assert score.shape == (cfg.batch_size, cfg.input_pc_num, 50)
        # channel plan parity (networks.py:239): layer1 input channels
        d1 = svs["params"]["layer1"]["Dense_0"]["kernel"].shape[0]
        want = 3 + 3 + 3 + 3 + 16 + 384 + 384 + 512 + cfg.feature_num * 2
        assert d1 == want


class TestDecoder:
    def test_output_sizes_1024(self):
        cfg = tiny().replace(output_fc_pc_num=16, output_conv_pc_num=1024,
                             feature_num=64)
        dec = snn.Decoder(cfg)
        f = jnp.asarray(np.random.RandomState(0).randn(2, 64), jnp.float32)
        vs = dec.init(jax.random.PRNGKey(0), f, train=False)
        out = dec.apply(vs, f, train=False)
        assert out.pc.shape == (2, 16 + 1024, 3)
        assert out.conv_pc4.shape == (2, 256, 3)
        assert out.conv_pc5.shape == (2, 1024, 3)
        assert out.conv_pc6.shape == (2, 4096, 3)

    def test_output_pc_num_validated(self):
        """An explicit --output_pc_num (reference autoencoder.py buffer
        size) must agree with fc + selected conv output; 0 = derived."""
        import pytest
        cfg = tiny().replace(output_fc_pc_num=16, output_conv_pc_num=1024,
                             feature_num=64, output_pc_num=1280)
        dec = snn.Decoder(cfg)
        f = jnp.zeros((2, 64), jnp.float32)
        with pytest.raises(ValueError, match="output_pc_num"):
            dec.init(jax.random.PRNGKey(0), f, train=False)
        ok = cfg.replace(output_pc_num=16 + 1024)
        snn.Decoder(ok).init(jax.random.PRNGKey(0), f, train=False)

    def test_fc_only(self):
        cfg = tiny().replace(output_fc_pc_num=16, output_conv_pc_num=0,
                             feature_num=64)
        dec = snn.Decoder(cfg)
        f = jnp.ones((2, 64))
        vs = dec.init(jax.random.PRNGKey(0), f, train=False)
        out = dec.apply(vs, f, train=False)
        assert out.pc.shape == (2, 16, 3)
        assert out.conv_pc4 is None

    def test_bias_init_spreads_points(self):
        """linear_out / ConvToPC bias ~ U(-1,1) (networks.py:360,383)."""
        cfg = tiny().replace(output_fc_pc_num=64, output_conv_pc_num=1024,
                             feature_num=64)
        dec = snn.Decoder(cfg)
        vs = dec.init(jax.random.PRNGKey(3), jnp.zeros((1, 64)), train=False)
        b = np.asarray(
            vs["params"]["fc_decoder"]["linear_out"]["bias"])
        assert b.min() < -0.5 and b.max() > 0.5


class TestTransformer:
    def test_sin_theta_range(self):
        cfg = tiny()
        tr = snn.Transformer(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 20, 3), jnp.float32)
        vs = tr.init(jax.random.PRNGKey(0), x, train=False)
        s = tr.apply(vs, x, train=False)
        assert s.shape == (4, 1)
        assert np.all(np.abs(np.asarray(s)) <= 1.0)
        R = snn.rotation_matrix_y(s)
        assert R.shape == (4, 3, 3)
        # orthogonality
        RtR = np.asarray(jnp.einsum("bij,bik->bjk", R, R))
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (4, 1, 1)),
                                   atol=1e-4)


class TestVariants:
    def test_activations(self):
        x = jnp.asarray([-1.0, 0.0, 2.0])
        fns = {n: snn.activation_fn(n)
               for n in ("relu", "elu", "swish", "leakyrelu")}
        np.testing.assert_allclose(np.asarray(fns["relu"](x)), [0, 0, 2])
        np.testing.assert_allclose(np.asarray(fns["elu"](x)),
                                   [np.expm1(-1), 0, 2], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fns["swish"](x)),
            np.asarray(x) / (1 + np.exp(-np.asarray(x))), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(fns["leakyrelu"](x)),
                                   [-0.1, 0, 2], rtol=1e-5)

    def test_instance_norm_layer(self):
        m = snn.PointLayer(8, activation=None, normalization="instance")
        x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 4) * 3 + 5,
                        jnp.float32)
        vs = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vs, x)
        # per-sample, per-channel normalized (scale 1, bias 0 at init)
        np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=1)),
                                   np.zeros((2, 8)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.std(y, axis=1)),
                                   np.ones((2, 8)), atol=1e-3)

    def test_encoder_with_elu_instance(self):
        cfg = tiny().replace(activation="elu", normalization="instance")
        enc = snn.Encoder(cfg)
        pc, sn, node = make_inputs(cfg)
        vs = enc.init(jax.random.PRNGKey(0), pc, sn, node, train=False)
        out = enc.apply(vs, pc, sn, node, train=False)
        assert np.isfinite(np.asarray(out.feature)).all()


class TestDecoder4096:
    def test_output_sizes_4096(self):
        cfg = tiny().replace(output_fc_pc_num=16, output_conv_pc_num=4096,
                             feature_num=64)
        dec = snn.Decoder(cfg)
        f = jnp.asarray(np.random.RandomState(0).randn(2, 64), jnp.float32)
        vs = dec.init(jax.random.PRNGKey(0), f, train=False)
        out = dec.apply(vs, f, train=False)
        assert out.pc.shape == (2, 16 + 4096, 3)
        assert out.conv_pc6.shape == (2, 4096, 3)
