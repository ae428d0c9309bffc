"""Pallas chamfer kernel parity (interpret mode on CPU) vs the dense oracle."""

import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.ops.chamfer import chamfer_distance_reference
from vn_pointcloudcompletion_tpu.ops.chamfer_pallas_bidir import (
    nn_bidirectional_pallas,
)


class TestPallasChamfer:
    @pytest.mark.parametrize("n,m", [(700, 1300), (512, 1024), (100, 60)])
    def test_bidirectional_matches_oracle(self, rng, n, m):
        x = rng.standard_normal((2, n, 3)).astype(np.float32)
        y = rng.standard_normal((2, m, 3)).astype(np.float32)
        d1, i1, d2, i2 = nn_bidirectional_pallas(x, y, interpret=True)
        rd1, rd2, ri1, ri2 = chamfer_distance_reference(x, y)
        np.testing.assert_allclose(np.asarray(d1), rd1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), rd2, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), ri1)
        np.testing.assert_array_equal(np.asarray(i2), ri2)

    def test_padding_never_wins(self, rng):
        # m far from a tile multiple; padded columns must not appear as
        # matches in either direction, and padded ROWS must not win a column
        x = rng.standard_normal((1, 520, 3)).astype(np.float32) * 100
        y = rng.standard_normal((1, 1025, 3)).astype(np.float32) * 100
        d1, i1, d2, i2 = nn_bidirectional_pallas(x, y, interpret=True)
        assert int(np.asarray(i1).max()) < 1025
        assert int(np.asarray(i2).max()) < 520
        assert np.isfinite(np.asarray(d1)).all()
        assert np.isfinite(np.asarray(d2)).all()


class TestTopkMinPallas:
    """VMEM-resident k-smallest extraction vs lax.top_k (interpret mode)."""

    @pytest.mark.parametrize("n,m,k", [(300, 1000, 16), (256, 128, 8),
                                       (70, 257, 5)])
    def test_matches_topk(self, rng, n, m, k):
        import jax
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.ops.knn_pallas import topk_min_pallas

        d = jnp.asarray(rng.standard_normal((2, n, m)).astype(np.float32) ** 2)
        vals, idx = topk_min_pallas(d, k, interpret=True)
        ref_nd, ref_i = jax.lax.top_k(-d, k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(-ref_nd),
                                   atol=1e-6)
        # values ascending; index SETS equal (tie order may differ)
        assert (np.diff(np.asarray(vals), axis=-1) >= 0).all()
        np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=-1),
                                      np.sort(np.asarray(ref_i), axis=-1))

    def test_value_grads_match_topk(self, rng):
        import jax
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.ops.knn_pallas import topk_min_pallas

        d = jnp.asarray(rng.standard_normal((2, 60, 90)).astype(np.float32) ** 2)

        def loss_pallas(d):
            vals, _ = topk_min_pallas(d, 7, True)
            return jnp.sum(vals * vals)

        def loss_topk(d):
            nd, _ = jax.lax.top_k(-d, 7)
            return jnp.sum(nd * nd)

        gp = jax.grad(loss_pallas)(d)
        gt = jax.grad(loss_topk)(d)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gt), atol=1e-5)


class TestKnnMinPallas:
    """Fused distance + k-extraction vs sq-dist -> lax.top_k (interpret)."""

    @pytest.mark.parametrize("n,m,d,k", [(300, 1000, 3, 16), (256, 512, 96, 8),
                                         (70, 257, 192, 5), (128, 128, 130, 4)])
    def test_matches_topk(self, rng, n, m, d, k):
        import jax
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.ops.knn import pairwise_sqdist
        from vn_pointcloudcompletion_tpu.ops.knn_pallas import knn_min_pallas

        q = jnp.asarray(rng.standard_normal((2, n, d)).astype(np.float32))
        r = jnp.asarray(rng.standard_normal((2, m, d)).astype(np.float32))
        vals, idx = knn_min_pallas(q, r, k, True)
        ref_nd, ref_i = jax.lax.top_k(-pairwise_sqdist(q, r), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(-ref_nd),
                                   atol=1e-3)
        assert (np.diff(np.asarray(vals), axis=-1) >= -1e-6).all()
        np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=-1),
                                      np.sort(np.asarray(ref_i), axis=-1))
        assert int(np.asarray(idx).max()) < m

    def test_grads_match_composed(self, rng):
        import jax
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.ops.knn import pairwise_sqdist
        from vn_pointcloudcompletion_tpu.ops.knn_pallas import knn_min_pallas

        # well-separated points so argmins are stable under both paths
        q = jnp.asarray(rng.standard_normal((2, 40, 3)).astype(np.float32)) * 3
        r = jnp.asarray(rng.standard_normal((2, 70, 3)).astype(np.float32)) * 3

        def loss_fused(q, r):
            vals, _ = knn_min_pallas(q, r, 5, True)
            return jnp.sum(vals * jnp.arange(1.0, 6.0))

        def loss_ref(q, r):
            nd, _ = jax.lax.top_k(-pairwise_sqdist(q, r), 5)
            return jnp.sum(-nd * jnp.arange(1.0, 6.0))

        gq, gr = jax.grad(loss_fused, argnums=(0, 1))(q, r)
        rq, rr = jax.grad(loss_ref, argnums=(0, 1))(q, r)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(rq),
                                   atol=1e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(rr),
                                   atol=1e-3, rtol=1e-3)


class TestFPSPallas:
    """Single-program greedy FPS vs the jnp fori_loop formulation."""

    @pytest.mark.parametrize("n,s", [(300, 64), (1000, 128), (130, 50)])
    def test_matches_fori_loop(self, rng, n, s):
        import jax.numpy as jnp

        import importlib

        fps_mod = importlib.import_module(
            "vn_pointcloudcompletion_tpu.ops.fps")
        fp = importlib.import_module(
            "vn_pointcloudcompletion_tpu.ops.fps_pallas")

        pts = jnp.asarray(rng.standard_normal((3, n, 3)).astype(np.float32))
        got = fp.furthest_point_sample_pallas(pts, s, interpret=True)
        # reference path: force the jnp branch regardless of backend
        old = fp.eligible
        try:
            fp.eligible = lambda *a: False
            want = fps_mod.furthest_point_sample(pts, s)
        finally:
            fp.eligible = old
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
