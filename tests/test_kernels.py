"""Cross-checks: Pallas kernel vs XLA impls vs the native C++ reference
(SURVEY.md §4b) plus the sorted-segment pipeline helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import ops
from sonet_tpu.ops.pallas import segment_argmax, segment_max_pallas
from sonet_tpu.ops.segment_sorted import segment_max_sorted, sort_by_segment


def _case(B=2, N=70, C=9, M=8, seed=0, sorted_ids=True, with_ties=False):
    rs = np.random.RandomState(seed)
    data = rs.randn(B, N, C).astype(np.float32)
    ids = rs.randint(0, M, (B, N)).astype(np.int32)
    ids[ids == 3] = 2  # empty segment
    if with_ties:
        data[:, 1] = data[:, 0]
        ids[:, 1] = ids[:, 0]
    if sorted_ids:
        order = np.argsort(ids, axis=1)
        ids = np.take_along_axis(ids, order, 1)
        data = np.take_along_axis(data, order[..., None], 1)
    return jnp.asarray(data), jnp.asarray(ids)


class TestPallasKernel:
    @pytest.mark.parametrize("sorted_ids", [True, False])
    def test_matches_scatter(self, sorted_ids):
        data, ids = _case(sorted_ids=sorted_ids)
        got = segment_max_pallas(data, ids, 8, block_n=32, block_c=8)
        want = ops.segment_max_scatter(data, ids, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_matches_native_cpp(self):
        native = pytest.importorskip("sonet_tpu.native")
        if not native.available():
            pytest.skip("g++ unavailable")
        data, ids = _case()
        vals, idx = native.segment_argmax_native(np.asarray(data),
                                                 np.asarray(ids), 8,
                                                 num_threads=2)
        got_idx = segment_argmax(data, ids, 8, block_n=32, block_c=8)
        got_vals = jnp.take_along_axis(data, got_idx, axis=1)
        np.testing.assert_allclose(np.asarray(got_vals), vals)
        # argmax ties broken identically (first max wins)
        np.testing.assert_array_equal(np.asarray(got_idx), idx)

    def test_gradient_is_gather(self):
        data, ids = _case()

        def f(d):
            return jnp.sum(segment_max_pallas(d, ids, 8, block_n=32,
                                              block_c=8) ** 2)

        g = jax.grad(f)(data)
        g_ref = jax.grad(
            lambda d: jnp.sum(ops.segment_max_scatter(d, ids, 8) ** 2))(data)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


class TestSortedSegmentMax:
    def test_matches_scatter(self):
        data, ids = _case()
        got = segment_max_sorted(data, ids, 8)
        want = ops.segment_max_scatter(data, ids, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_gradient_matches(self):
        data, ids = _case()
        g1 = jax.grad(lambda d: jnp.sum(segment_max_sorted(d, ids, 8) ** 2))(
            data)
        g2 = jax.grad(
            lambda d: jnp.sum(ops.segment_max_scatter(d, ids, 8) ** 2))(data)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)

    def test_tie_gradient_sum_preserved(self):
        """ties split gradient equally (sum-preserving; the reference
        sends all to the first winner — documented deviation)."""
        data = jnp.asarray([[[2.0], [2.0], [1.0]]])
        ids = jnp.asarray([[0, 0, 1]], jnp.int32)
        g = jax.grad(lambda d: jnp.sum(segment_max_sorted(d, ids, 2)))(data)
        np.testing.assert_allclose(np.asarray(g)[0, :, 0], [0.5, 0.5, 1.0])

    def test_sort_roundtrip(self):
        rs = np.random.RandomState(3)
        ids = jnp.asarray(rs.randint(0, 5, (2, 20)).astype(np.int32))
        x = jnp.asarray(rs.randn(2, 20, 4).astype(np.float32))
        sids, perm, inv, sx = sort_by_segment(ids, x)
        assert bool((jnp.diff(sids, axis=1) >= 0).all())
        back = jnp.take_along_axis(sx, inv[..., None], axis=1)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestNativeKernel:
    def test_mt_matches_st(self):
        native = pytest.importorskip("sonet_tpu.native")
        if not native.available():
            pytest.skip("g++ unavailable")
        rs = np.random.RandomState(1)
        data = rs.randn(4, 50, 6).astype(np.float32)
        ids = rs.randint(0, 7, (4, 50)).astype(np.int32)
        v1, i1 = native.segment_argmax_native(data, ids, 7, num_threads=1)
        v4, i4 = native.segment_argmax_native(data, ids, 7, num_threads=4)
        np.testing.assert_array_equal(v1, v4)
        np.testing.assert_array_equal(i1, i4)

    def test_empty_semantics(self):
        native = pytest.importorskip("sonet_tpu.native")
        if not native.available():
            pytest.skip("g++ unavailable")
        data = np.asarray([[[5.0, 6.0], [1.0, 2.0]]], np.float32)
        ids = np.asarray([[1, 1]], np.int32)
        vals, idx = native.segment_argmax_native(data, ids, 3)
        # segments 0 and 2 empty -> value of point 0, index 0
        np.testing.assert_allclose(vals[0, 0], [5.0, 6.0])
        np.testing.assert_allclose(vals[0, 2], [5.0, 6.0])
        np.testing.assert_array_equal(idx[0, 0], [0, 0])


class TestWindowedKernel:
    @pytest.mark.parametrize("sorted_ids", [True, False])
    def test_matches_scatter(self, sorted_ids):
        from sonet_tpu.ops.pallas import segment_max_windowed
        data, ids = _case(sorted_ids=sorted_ids)
        got = segment_max_windowed(data, ids, 8, window=4, block_n=16,
                                   block_c=8)
        want = ops.segment_max_scatter(data, ids, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    def test_window_larger_than_m(self):
        from sonet_tpu.ops.pallas import segment_max_windowed
        data, ids = _case()
        got = segment_max_windowed(data, ids, 8, window=32, block_n=16,
                                   block_c=8)
        want = ops.segment_max_scatter(data, ids, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
