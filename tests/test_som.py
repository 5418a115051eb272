"""SOM unit tests: parity vs the reference math (numpy goldens) and
behavioral checks (SURVEY.md §4a)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonet_tpu import som
from sonet_tpu.som.potential_field import potential_field_nodes


class TestPotentialField:
    def test_parity_with_reference(self):
        """The reference PotentialField is pure numpy — run it directly
        as the golden (read-only import from /root/reference)."""
        sys.path.insert(0, "/root/reference/util")
        try:
            import potential_field as ref_pf
        except ImportError:
            pytest.skip("reference not available")
        finally:
            sys.path.pop(0)
        ref = ref_pf.PotentialField(16, 3)
        ref.optimize()
        got = potential_field_nodes(16, 3)
        np.testing.assert_allclose(got, ref.node.astype(np.float32),
                                   rtol=1e-4, atol=1e-5)

    def test_in_bounds_and_spread(self):
        nodes = potential_field_nodes(64, 3)
        assert nodes.shape == (64, 3)
        assert np.all(np.abs(nodes) < 1.5)
        # repulsion spreads nodes: min pairwise distance is healthy
        d = np.linalg.norm(nodes[:, None] - nodes[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 0.05

    def test_grid_order(self):
        nodes = potential_field_nodes(16, 3)
        rows = nodes.reshape(4, 4, 3)
        # x sorted across rows (row-major reorder), y sorted within rows
        assert np.all(np.diff(rows[:, :, 1], axis=1) >= 0)


def _ref_batch_update(nodes, x, lr, sigma, rows, cols, sigma0=0.4):
    """Direct numpy transcription of BatchSOM.batch_update
    (util/som.py:295-353) as the golden."""
    B, M, C = nodes.shape
    d = np.sum((x[:, :, None] - nodes[:, None]) ** 2, -1)  # (B,N,M)
    mi = d.argmin(-1)  # (B,N)
    mask = np.eye(M)[mi]  # (B,N,M)
    row_sum = mask.sum(1) + 1e-5
    row_max = mask.max(1)
    mean = np.einsum("bnm,bnc->bmc", mask, x) / row_sum[..., None]
    # w0[i, j] via gaussian grid
    idx = np.arange(M)
    ri, ci = idx // cols, idx % cols
    d2 = (ri[:, None] - ri[None]) ** 2 + (ci[:, None] - ci[None]) ** 2
    w0 = np.exp(-d2 / (2 * np.pi * sigma0 ** 2))
    w = np.exp(np.log(w0) * (1.0 / ((sigma / sigma0) ** 2)))
    diff = (mean[:, :, None, :] - nodes[:, None, :, :]) * row_max[:, :, None, None]
    delta = lr * np.einsum("bijc,ij->bjc", diff, w)
    return nodes + delta


class TestBatchUpdate:
    def test_single_step_parity_with_torch_reference(self):
        """Run the actual reference BatchSOM.batch_update (torch CPU) as
        golden.  Full-fit trajectories diverge chaotically from fp noise
        (SURVEY.md §7 'data-dependent ties'), so parity is asserted at
        the single-step level + metric level (quantization error)."""
        import types
        sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
        sys.path.insert(0, "/root/reference")
        try:
            import importlib
            ref_som_mod = importlib.import_module("util.som")
            import torch
        except ImportError:
            pytest.skip("reference/torch not available")
        finally:
            sys.path.pop(0)

        rs = np.random.RandomState(5)
        xn = rs.randn(2, 100, 3).astype(np.float32)
        nodes0 = rs.randn(2, 16, 3).astype(np.float32) * 0.5

        b = ref_som_mod.BatchSOM(4, 4, 3, 0, 2)
        b.node = torch.from_numpy(
            np.ascontiguousarray(nodes0.transpose(0, 2, 1)))
        b.batch_update(torch.from_numpy(
            np.ascontiguousarray(xn.transpose(0, 2, 1))), 0.3, 0.25)
        want = b.node.numpy().transpose(0, 2, 1)

        cfg = som.SOMConfig(rows=4, cols=4, dim=3)
        got = np.asarray(som.batch_update(jnp.asarray(nodes0),
                                          jnp.asarray(xn), 0.3, 0.25, cfg))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_parity_with_reference_math(self):
        rs = np.random.RandomState(0)
        cfg = som.SOMConfig(rows=4, cols=4, dim=3)
        x = rs.randn(2, 50, 3).astype(np.float32)
        nodes = rs.randn(2, 16, 3).astype(np.float32) * 0.5
        got = np.asarray(som.batch_update(jnp.asarray(nodes), jnp.asarray(x),
                                          0.3, 0.25, cfg))
        want = _ref_batch_update(nodes, x, 0.3, 0.25, 4, 4)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_empty_node_not_pulled_to_origin(self):
        """occupied-gating (util/som.py:325 comment): isolated nodes only
        move via their neighborhood, not toward a zero mean."""
        cfg = som.SOMConfig(rows=2, cols=2, dim=3)
        x = jnp.ones((1, 10, 3))  # all points at (1,1,1)
        nodes = jnp.asarray([[[1.0, 1, 1], [50, 50, 50],
                              [-50, -50, -50], [80, 80, 80]]])
        new = som.batch_update(nodes, x, 0.5, 0.4, cfg)
        # far empty nodes move toward the occupied cluster mean, not to 0
        assert float(new[0, 1, 0]) < 50.0
        assert float(new[0, 2, 0]) > -50.0


class TestFit:
    def test_quantization_error_decreases(self):
        # surface data (unit sphere), like real point clouds: the
        # volume-filling potential-field init is far from optimal there
        rs = np.random.RandomState(1)
        raw = rs.randn(2, 200, 3).astype(np.float32)
        x = jnp.asarray(raw / np.linalg.norm(raw, axis=-1, keepdims=True))
        cfg = som.SOMConfig(rows=4, cols=4, dim=3, schedule="prep")
        init = som.init_nodes(cfg, 2)
        nodes = jax.jit(lambda x: som.fit(x, cfg))(x)
        from sonet_tpu.ops import pairwise_sqdist
        q0 = float(jnp.mean(jnp.min(pairwise_sqdist(x, init), -1)))
        q1 = float(jnp.mean(jnp.min(pairwise_sqdist(x, nodes), -1)))
        # metric-level parity: the torch reference lands at ratio ~0.76
        # ("online") / ~0.84 ("prep") on this data; assert same ballpark
        assert q1 < q0 * 0.9, (q0, q1)
        # nodes migrate from the volume-filling init onto the surface
        radius = np.linalg.norm(np.asarray(nodes), axis=-1)
        assert radius.mean() > 0.85

    def test_schedules_differ(self):
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.rand(1, 100, 3).astype(np.float32))
        a = som.fit(x, som.SOMConfig(4, 4, 3, schedule="prep"))
        b = som.fit(x, som.SOMConfig(4, 4, 3, schedule="online"))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestQuery:
    def test_query_matches_argmin(self):
        rs = np.random.RandomState(3)
        x = rs.randn(2, 30, 3).astype(np.float32)
        nodes = rs.randn(2, 9, 3).astype(np.float32)
        mi, occ = som.query(jnp.asarray(nodes), jnp.asarray(x))
        d = np.sum((x[:, :, None] - nodes[:, None]) ** 2, -1)
        np.testing.assert_array_equal(np.asarray(mi), d.argmin(-1))
        for b in range(2):
            want_occ = np.zeros(9, bool)
            want_occ[d[b].argmin(-1)] = True
            np.testing.assert_array_equal(np.asarray(occ)[b], want_occ)
