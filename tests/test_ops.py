"""Unit tests for the ops layer vs numpy goldens (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import ops


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


class TestPairwise:
    def test_sqdist_matches_numpy(self):
        a = _rand(2, 17, 3, seed=1)
        b = _rand(2, 9, 3, seed=2)
        got = np.asarray(ops.pairwise_sqdist(a, b))
        want = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_knn_self_first(self):
        pts = _rand(2, 12, 3, seed=3)
        idx = np.asarray(ops.knn(pts, k=4))
        assert idx.shape == (2, 12, 4)
        # nearest neighbor of a point in self-kNN is itself
        np.testing.assert_array_equal(idx[:, :, 0],
                                      np.tile(np.arange(12), (2, 1)))

    def test_knn_matches_numpy_bruteforce(self):
        pts = _rand(1, 20, 3, seed=4)
        k = 5
        idx = np.asarray(ops.knn(pts, k=k))[0]
        d = np.sum((pts[0][:, None] - pts[0][None]) ** 2, -1)
        want = np.argsort(d, axis=1)[:, :k]
        got_d = np.take_along_axis(d, idx, axis=1)
        want_d = np.take_along_axis(d, want, axis=1)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)

    def test_assign_topk(self):
        x = _rand(2, 10, 3, seed=5)
        nodes = _rand(2, 6, 3, seed=6)
        k = 2
        res = ops.assign_topk(jnp.asarray(x), jnp.asarray(nodes), k)
        assert res.min_idx.shape == (2, 20)
        d = np.sum((x[:, :, None] - nodes[:, None]) ** 2, -1)  # (2,10,6)
        order = np.argsort(d, axis=2)
        # k-major stacking: block i is the i-th nearest node id
        want = np.concatenate([order[:, :, 0], order[:, :, 1]], axis=1)
        got_d = np.take_along_axis(
            d.reshape(2, 10, 6), np.asarray(res.min_idx).reshape(2, 2, 10)
            .transpose(0, 2, 1), axis=2)
        want_d = np.take_along_axis(d, order[:, :, :2], axis=2)
        np.testing.assert_allclose(np.sort(got_d, -1), np.sort(want_d, -1),
                                   rtol=1e-4, atol=1e-5)
        # occupancy
        occ = np.zeros((2, 6), bool)
        for b in range(2):
            occ[b, np.asarray(res.min_idx)[b]] = True
        np.testing.assert_array_equal(np.asarray(res.mask_row_max), occ)


class TestSegment:
    def _golden_segment_max(self, data, ids, M):
        B, N, C = data.shape
        out = np.zeros((B, M, C), np.float32)
        for b in range(B):
            for m in range(M):
                sel = data[b][ids[b] == m]
                out[b, m] = sel.max(0) if len(sel) else data[b, 0]
        return out

    @pytest.mark.parametrize("impl", ["onehot", "scatter"])
    def test_segment_max(self, impl):
        rs = np.random.RandomState(7)
        data = rs.randn(2, 40, 5).astype(np.float32)
        ids = rs.randint(0, 7, size=(2, 40)).astype(np.int32)
        # guarantee one empty segment
        ids[ids == 3] = 2
        M = 7
        fn = {"onehot": ops.segment_max_onehot,
              "scatter": ops.segment_max_scatter}[impl]
        got = np.asarray(fn(jnp.asarray(data), jnp.asarray(ids), M))
        want = self._golden_segment_max(data, ids, M)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_segment_max_gradient_flows_to_argmax(self):
        data = jnp.asarray([[[1.0], [3.0], [2.0]]])  # (1, 3, 1)
        ids = jnp.asarray([[0, 0, 1]], jnp.int32)

        def f(d):
            return jnp.sum(ops.segment_max(d, ids, 2))

        g = np.asarray(jax.grad(f)(data))[0, :, 0]
        np.testing.assert_allclose(g, [0.0, 1.0, 1.0])

    def test_segment_mean(self):
        rs = np.random.RandomState(8)
        data = rs.randn(2, 30, 4).astype(np.float32)
        ids = rs.randint(0, 5, size=(2, 30))
        onehot = ops.one_hot_f32(jnp.asarray(ids), 5)
        got = np.asarray(ops.segment_mean_onehot(jnp.asarray(data), onehot))
        for b in range(2):
            for m in range(5):
                sel = data[b][ids[b] == m]
                want = sel.sum(0) / (len(sel) + 1e-5)
                np.testing.assert_allclose(got[b, m], want, rtol=1e-4,
                                           atol=1e-5)

    def test_counts(self):
        ids = jnp.asarray([[0, 0, 2, 2, 2, 4]], jnp.int32)
        got = np.asarray(ops.segment_counts(ids, 5))
        np.testing.assert_array_equal(got, [[2, 0, 3, 0, 1]])


class TestGather:
    def test_knn_gather(self):
        data = _rand(2, 8, 4, seed=9)
        idx = np.random.RandomState(10).randint(0, 8, (2, 5, 3))
        got = np.asarray(ops.knn_gather(jnp.asarray(data), jnp.asarray(idx)))
        for b in range(2):
            for q in range(5):
                for j in range(3):
                    np.testing.assert_array_equal(got[b, q, j],
                                                  data[b, idx[b, q, j]])

    def test_gather_by_segment(self):
        nf = _rand(2, 6, 3, seed=11)
        ids = np.random.RandomState(12).randint(0, 6, (2, 10))
        got = np.asarray(ops.gather_by_segment(jnp.asarray(nf),
                                               jnp.asarray(ids)))
        for b in range(2):
            np.testing.assert_array_equal(got[b], nf[b][ids[b]])


class TestChamfer:
    def test_matches_numpy(self):
        rs = np.random.RandomState(13)
        pred = rs.randn(2, 15, 3).astype(np.float32)
        gt = rs.randn(2, 25, 3).astype(np.float32)
        res = ops.chamfer(jnp.asarray(pred), jnp.asarray(gt))

        d = np.sum((pred[:, :, None] - gt[:, None]) ** 2, -1)  # (2,15,25)
        sel_gt = np.take_along_axis(gt, d.argmin(2)[..., None], 1)
        fwd = np.sqrt(np.sum((sel_gt - pred) ** 2, -1) + 1e-8)
        sel_pr = np.take_along_axis(pred, d.argmin(1)[..., None], 1)
        bwd = np.sqrt(np.sum((sel_pr - gt) ** 2, -1) + 1e-8)
        np.testing.assert_allclose(float(res.forward_loss), fwd.mean(),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(res.backward_loss), bwd.mean(),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(res.loss_array),
                                   fwd.mean(1) + bwd.mean(1), rtol=1e-4)

    def test_zero_for_identical_clouds(self):
        pc = _rand(1, 10, 3, seed=14)
        res = ops.chamfer(jnp.asarray(pc), jnp.asarray(pc))
        assert float(res.loss) < 1e-3  # sqrt(eps)*2 floor

    def test_gradient_finite(self):
        pc = jnp.asarray(_rand(1, 10, 3, seed=15))
        gt = jnp.asarray(_rand(1, 12, 3, seed=16))
        g = jax.grad(lambda p: ops.chamfer(p, gt).loss)(pc)
        assert np.all(np.isfinite(np.asarray(g)))


class TestIoU:
    def test_perfect_prediction(self):
        seg = jnp.asarray([[0, 1, 2, 3, 0, 1]], jnp.int32)
        label = jnp.asarray([0], jnp.int32)
        iou = ops.iou_per_shape(seg, seg, label)
        np.testing.assert_allclose(np.asarray(iou), [1.0], atol=1e-3)

    def test_union_zero_is_one(self):
        # category 1 has parts {4,5}; neither present -> IoU 1.0 each
        seg_gt = jnp.asarray([[4, 4, 5, 5]], jnp.int32)
        seg_pred = jnp.asarray([[4, 4, 5, 5]], jnp.int32)
        label = jnp.asarray([1], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(ops.iou_per_shape(seg_pred, seg_gt, label)), [1.0],
            atol=1e-3)
        # gt/pred entirely on part 4 -> part 5 has union 0 -> 1.0; part 4 = 1
        seg2 = jnp.asarray([[4, 4, 4, 4]], jnp.int32)
        np.testing.assert_allclose(
            np.asarray(ops.iou_per_shape(seg2, seg2, label)), [1.0],
            atol=1e-3)

    def test_partial(self):
        # category 2, parts {6, 7}: half the points mislabeled
        seg_gt = jnp.asarray([[6, 6, 7, 7]], jnp.int32)
        seg_pred = jnp.asarray([[6, 7, 7, 7]], jnp.int32)
        label = jnp.asarray([2], jnp.int32)
        # part 6: inter 1, union 2 -> .5 ; part 7: inter 2, union 3 -> 2/3
        want = (1 / 2.0001 + 2 / 3.0001) / 2
        np.testing.assert_allclose(
            np.asarray(ops.iou_per_shape(seg_pred, seg_gt, label)), [want],
            rtol=1e-3)

    def test_compute_iou_from_scores(self):
        score = jax.nn.one_hot(jnp.asarray([[0, 1, 2, 3]]), 50) * 5.0
        seg = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        label = jnp.asarray([0], jnp.int32)
        np.testing.assert_allclose(
            float(ops.compute_iou(score, seg, label)), 1.0, atol=1e-3)
