"""Sorted-pipeline equivalence: the production TPU pooling path
(pooling="sorted_window": payload-ride sort + windowed Pallas forward +
matmul-routed VJP) must match the scatter reference path bit-for-bit on
forward scores and to reassociation tolerance on gradients — including
empty-node semantics (reference networks.py:185: empty node forwards the
feature of original stacked point 0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import config as cfg_mod
from sonet_tpu.models import build_model
from sonet_tpu.ops import (permute_points, segment_max, segment_max_fast,
                           sort_by_segment)


@pytest.fixture(scope="module")
def inputs():
    cfg = cfg_mod.tiny_test()
    rs = np.random.RandomState(0)
    B, N, M = cfg.batch_size, cfg.input_pc_num, cfg.node_num
    pc = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    sn = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    # one node far away => guaranteed empty clusters
    node = jnp.asarray(np.concatenate(
        [rs.randn(B, M - 1, 3), np.full((B, 1, 3), 50.0)], axis=1
    ).astype(np.float32))
    return cfg, pc, sn, node, rs


class TestSegmentMaxFast:
    def test_matches_scatter_sorted_ids(self):
        rs = np.random.RandomState(1)
        B, N, C, M = 2, 96, 24, 8
        data = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        ids = jnp.asarray(np.sort(rs.randint(0, M, (B, N)), axis=1))
        ref = segment_max(data, ids, M)
        got = segment_max_fast(data, ids, M)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_empty_segment_point0_idx(self):
        rs = np.random.RandomState(2)
        B, N, C, M = 2, 32, 8, 6
        data = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        # segment 3 empty everywhere; point0 passed at a nonzero slot
        ids_np = np.sort(rs.choice([0, 1, 2, 4, 5], (B, N)), axis=1)
        ids = jnp.asarray(ids_np)
        p0 = jnp.asarray(rs.randint(0, N, B))
        got = segment_max_fast(data, ids, M, point0_idx=p0)
        for b in range(B):
            np.testing.assert_array_equal(np.asarray(got[b, 3]),
                                          np.asarray(data[b, p0[b]]))

    def test_gradient_routes_to_winner_and_point0(self):
        rs = np.random.RandomState(3)
        B, N, C, M = 1, 16, 4, 4
        data = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        ids = jnp.asarray(np.sort(rs.randint(0, 3, (B, N)), axis=1))  # 3 empty
        p0 = jnp.asarray([5])

        def f(d):
            return jnp.sum(segment_max_fast(d, ids, M, point0_idx=p0) ** 2)

        def f_ref(d):
            out = segment_max(d, ids, M)
            # rewrite the empty row to point0's feature like fast does
            counts = jnp.sum(jax.nn.one_hot(ids, M), axis=1)
            out = jnp.where((counts == 0)[..., None], d[:, 5:6, :], out)
            return jnp.sum(out ** 2)

        g = jax.grad(f)(data)
        g_ref = jax.grad(f_ref)(data)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-5)


class TestPermutePoints:
    def test_roundtrip_and_vjp(self):
        rs = np.random.RandomState(4)
        B, N, C = 3, 40, 5
        x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        ids = jnp.asarray(rs.randint(0, 7, (B, N)))
        _, perm, inv = sort_by_segment(ids)[:3]
        y = permute_points(x, perm, inv)
        back = permute_points(y, inv, perm)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
        # VJP == gather-based autodiff of plain take_along_axis
        g = jax.grad(lambda a: jnp.sum(jnp.sin(
            permute_points(a, perm, inv))))(x)
        g_ref = jax.grad(lambda a: jnp.sum(jnp.sin(
            jnp.take_along_axis(a, perm[..., None], axis=1))))(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("task", ["classify", "segment", "autoencode"])
def test_sorted_equals_scatter_model(inputs, task):
    cfg, pc, sn, node, rs = inputs
    c1 = cfg.replace(task=task, pooling="scatter")
    c2 = cfg.replace(task=task, pooling="sorted_window")
    m1, m2 = build_model(c1), build_model(c2)
    extra = (jnp.asarray(rs.randint(0, 16, pc.shape[0])),) \
        if task == "segment" else ()
    v = m1.init(jax.random.PRNGKey(0), pc, sn, node, *extra, train=False)
    out1, enc1 = m1.apply(v, pc, sn, node, *extra, train=False)
    out2, enc2 = m2.apply(v, pc, sn, node, *extra, train=False)
    assert int(jnp.sum(enc1.counts == 0)) > 0  # empty nodes exercised
    o1 = out1.pc if task == "autoencode" else out1
    o2 = out2.pc if task == "autoencode" else out2
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    # gradient equivalence (relative: summation order differs)
    def loss(params, model):
        o, _ = model.apply({"params": params,
                            "batch_stats": v["batch_stats"]},
                           pc, sn, node, *extra, train=False)
        o = o.pc if task == "autoencode" else o
        return jnp.mean(o * o)

    g1 = jax.grad(loss)(v["params"], m1)
    g2 = jax.grad(loss)(v["params"], m2)
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) /
                           (jnp.max(jnp.abs(a)) + 1e-12)), g1, g2)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-4
