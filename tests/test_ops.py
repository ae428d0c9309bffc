"""Parity tests for the geometry primitives against slow NumPy/torch oracles.

Follows the reference's own test pattern (unit_test.py:14-35): pin the fast
path to an obviously-correct dense-matrix implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.ops import (
    chamfer_distance,
    chamfer_distance_reference,
    earth_mover_distance,
    approx_match,
    furthest_point_sample,
    fps,
    knn,
    pairwise_sqdist,
    random_rotations,
    random_z_rotations,
    rotate_points,
    folding_grid_2d,
    folding_grid_3d,
)


class TestChamfer:
    @pytest.mark.parametrize("dim", [2, 3, 5])
    def test_matches_dense_oracle(self, rng, dim):
        x = rng.standard_normal((2, 257, dim)).astype(np.float32)
        y = rng.standard_normal((2, 130, dim)).astype(np.float32)
        d1, d2, i1, i2 = jax.jit(chamfer_distance)(x, y)
        rd1, rd2, ri1, ri2 = chamfer_distance_reference(x, y)
        np.testing.assert_allclose(d1, rd1, atol=1e-4)
        np.testing.assert_allclose(d2, rd2, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), ri1)
        np.testing.assert_array_equal(np.asarray(i2), ri2)

    def test_tiled_path(self, rng):
        # Sizes that force multiple scan tiles with padding remainder.
        x = rng.standard_normal((1, 64, 3)).astype(np.float32)
        y = rng.standard_normal((1, 1300, 3)).astype(np.float32)
        import vn_pointcloudcompletion_tpu.ops.chamfer as ch

        old = ch._TILE_BUDGET
        try:
            ch._TILE_BUDGET = 1  # tile = _MIN_TILE = 512 -> 3 tiles w/ padding
            d1, d2, i1, i2 = chamfer_distance(x, y)
        finally:
            ch._TILE_BUDGET = old
        rd1, rd2, ri1, ri2 = chamfer_distance_reference(x, y)
        np.testing.assert_allclose(d1, rd1, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i1), ri1)
        np.testing.assert_allclose(d2, rd2, atol=1e-4)

    def test_gradients_match_dense_autodiff(self, rng):
        x = rng.standard_normal((2, 40, 3)).astype(np.float32)
        y = rng.standard_normal((2, 30, 3)).astype(np.float32)

        def loss_fast(x, y):
            d1, d2, _, _ = chamfer_distance(x, y)
            return jnp.mean(d1) + jnp.mean(d2)

        def loss_dense(x, y):
            diff = x[:, :, None, :] - y[:, None, :, :]
            dist = jnp.sum(diff * diff, axis=-1)
            return jnp.mean(dist.min(axis=2)) + jnp.mean(dist.min(axis=1))

        gx_f, gy_f = jax.grad(loss_fast, argnums=(0, 1))(x, y)
        gx_d, gy_d = jax.grad(loss_dense, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(gx_f, gx_d, atol=1e-5)
        np.testing.assert_allclose(gy_f, gy_d, atol=1e-5)

    def test_gradients_large_table_scatter_path(self, rng):
        # n > _ONEHOT_ROWS forces the XLA scatter-add branch of the backward
        # cross term (the one-hot matmul branch covers small targets above).
        import vn_pointcloudcompletion_tpu.ops.chamfer as ch

        n = ch._ONEHOT_ROWS + 64
        x = rng.standard_normal((1, n, 3)).astype(np.float32)
        y = rng.standard_normal((1, 48, 3)).astype(np.float32)

        def loss_fast(x, y):
            d1, d2, _, _ = chamfer_distance(x, y)
            return jnp.mean(d1) + jnp.mean(d2)

        def loss_dense(x, y):
            diff = x[:, :, None, :] - y[:, None, :, :]
            dist = jnp.sum(diff * diff, axis=-1)
            return jnp.mean(dist.min(axis=2)) + jnp.mean(dist.min(axis=1))

        gx_f, gy_f = jax.grad(loss_fast, argnums=(0, 1))(x, y)
        gx_d, gy_d = jax.grad(loss_dense, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(gx_f, gx_d, atol=1e-5)
        np.testing.assert_allclose(gy_f, gy_d, atol=1e-5)


class TestEMD:
    def test_match_is_doubly_stochastic_scaled(self, rng):
        x = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.1
        y = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.1
        match = np.asarray(approx_match(x, y))  # (B, M, N)
        # equal counts: rows and columns each sum to ~1
        np.testing.assert_allclose(match.sum(axis=1), 1.0, atol=2e-2)
        np.testing.assert_allclose(match.sum(axis=2), 1.0, atol=2e-2)

    def test_identity_clouds_give_near_zero(self, rng):
        x = rng.standard_normal((1, 128, 3)).astype(np.float32) * 0.1
        cost = earth_mover_distance(x, x)
        assert float(cost[0]) < 1e-3

    def test_cost_upper_bounds_and_permutation_invariance(self, rng):
        x = rng.standard_normal((1, 64, 3)).astype(np.float32) * 0.1
        perm = rng.permutation(64)
        cost = float(earth_mover_distance(x, x[:, perm])[0])
        assert cost < 1e-3  # perfect matching exists

    def test_grad_flows_through_points_not_match(self, rng):
        x = rng.standard_normal((1, 32, 3)).astype(np.float32) * 0.1
        y = rng.standard_normal((1, 32, 3)).astype(np.float32) * 0.1
        g = jax.grad(lambda a: jnp.sum(earth_mover_distance(a, y)))(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestFPS:
    def test_first_index_is_zero_and_unique(self, rng):
        pts = rng.standard_normal((3, 200, 3)).astype(np.float32)
        idx = np.asarray(furthest_point_sample(pts, 50))
        assert (idx[:, 0] == 0).all()
        for b in range(3):
            assert len(set(idx[b].tolist())) == 50

    def test_greedy_maxmin_against_numpy(self, rng):
        pts = rng.standard_normal((1, 100, 3)).astype(np.float32)
        idx = np.asarray(furthest_point_sample(pts, 10))[0]

        # slow reference
        p = pts[0]
        ref = [0]
        mind = np.full(100, np.inf)
        for _ in range(9):
            d = np.sum((p - p[ref[-1]]) ** 2, axis=-1)
            mind = np.minimum(mind, d)
            ref.append(int(np.argmax(mind)))
        np.testing.assert_array_equal(idx, np.array(ref))

    def test_fps_subsample_shape(self, rng):
        pts = rng.standard_normal((2, 100, 3)).astype(np.float32)
        sub = fps(pts, 17)
        assert sub.shape == (2, 17, 3)


class TestKNN:
    def test_against_numpy_argsort(self, rng):
        q = rng.standard_normal((2, 50, 3)).astype(np.float32)
        r = rng.standard_normal((2, 80, 3)).astype(np.float32)
        d, idx = knn(q, r, 8)
        dn = np.asarray(pairwise_sqdist(q, r))
        ref_idx = np.argsort(dn, axis=-1, kind="stable")[:, :, :8]
        np.testing.assert_allclose(
            np.sort(np.asarray(d), axis=-1),
            np.take_along_axis(dn, ref_idx, axis=-1),
            atol=1e-4,
        )
        # distances at returned indices match returned distances
        np.testing.assert_allclose(
            np.take_along_axis(dn, np.asarray(idx), axis=-1), np.asarray(d), atol=1e-4
        )

    def test_sorted_ascending(self, rng):
        q = rng.standard_normal((1, 30, 3)).astype(np.float32)
        d, _ = knn(q, q, 5)
        d = np.asarray(d)
        assert (np.diff(d, axis=-1) >= -1e-6).all()
        # self is nearest with distance ~0
        np.testing.assert_allclose(d[:, :, 0], 0.0, atol=1e-5)


class TestRotations:
    def test_random_rotations_are_orthonormal(self):
        r = np.asarray(random_rotations(jax.random.key(0), 16))
        eye = np.eye(3)[None].repeat(16, axis=0)
        np.testing.assert_allclose(r @ r.transpose(0, 2, 1), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)

    def test_z_rotations_fix_z(self):
        r = np.asarray(random_z_rotations(jax.random.key(1), 8))
        z = np.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(
            np.einsum("d,bde->be", z, r), z[None].repeat(8, axis=0), atol=1e-6
        )

    def test_rotate_points_preserves_norms(self, rng):
        p = rng.standard_normal((4, 20, 3)).astype(np.float32)
        r = random_rotations(jax.random.key(2), 4)
        q = np.asarray(rotate_points(p, r))
        np.testing.assert_allclose(
            np.linalg.norm(q, axis=-1), np.linalg.norm(p, axis=-1), atol=1e-4
        )


class TestGrids:
    def test_grid_shapes_and_extent(self):
        g2 = np.asarray(folding_grid_2d(4))
        g3 = np.asarray(folding_grid_3d(8))
        assert g2.shape == (2, 16) and g3.shape == (3, 64)
        assert g2.min() == -0.05 and g2.max() == 0.05
        np.testing.assert_array_equal(g3[2], 0.0)

    def test_grid_ordering_matches_torch_expand(self):
        # a varies fastest: first row repeats the linspace
        g = np.asarray(folding_grid_2d(4))
        lin = np.linspace(-0.05, 0.05, 4, dtype=np.float32)
        np.testing.assert_allclose(g[0], np.tile(lin, 4), atol=1e-7)
        np.testing.assert_allclose(g[1], np.repeat(lin, 4), atol=1e-7)


class TestEMDOracle:
    """Pin the jitted annealed matching to the NumPy transliteration of
    emd_kernel.cu:26-243 (the repo's chamfer-oracle pattern)."""

    @pytest.mark.parametrize("n,m", [(64, 64), (96, 32), (32, 96)])
    def test_match_matches_oracle(self, rng, n, m):
        from vn_pointcloudcompletion_tpu.ops.emd import (
            approx_match,
            approx_match_reference,
        )

        a = rng.standard_normal((2, n, 3)).astype(np.float32) * 0.3
        b = rng.standard_normal((2, m, 3)).astype(np.float32) * 0.3
        got = np.asarray(approx_match(jnp.asarray(a), jnp.asarray(b)))
        want = approx_match_reference(a, b)
        assert got.shape == want.shape == (2, m, n)
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_cost_matches_oracle(self, rng):
        from vn_pointcloudcompletion_tpu.ops.emd import (
            earth_mover_distance,
            earth_mover_distance_reference,
        )

        a = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.3
        b = rng.standard_normal((2, 64, 3)).astype(np.float32) * 0.3
        got = np.asarray(earth_mover_distance(jnp.asarray(a), jnp.asarray(b)))
        want = earth_mover_distance_reference(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("n,m,block", [(64, 64, 32), (96, 32, 32),
                                           (100, 72, 32)])
    def test_blocked_matches_dense(self, rng, n, m, block):
        # padding path exercised by the non-divisible (100, 72) case
        from vn_pointcloudcompletion_tpu.ops.emd import (
            earth_mover_distance,
            earth_mover_distance_blocked,
        )

        a = rng.standard_normal((3, n, 3)).astype(np.float32) * 0.3
        b = rng.standard_normal((3, m, 3)).astype(np.float32) * 0.3
        dense = np.asarray(earth_mover_distance(jnp.asarray(a), jnp.asarray(b)))
        blocked = np.asarray(
            earth_mover_distance_blocked(jnp.asarray(a), jnp.asarray(b), block)
        )
        np.testing.assert_allclose(blocked, dense, rtol=1e-4, atol=1e-6)

    @pytest.mark.parametrize("n,m", [(64, 64), (100, 72)])
    def test_blocked_gradients_match_dense(self, rng, n, m):
        """Trainable blocked EMD (VERDICT r2 #7): the streaming custom VJP's
        match moments must reproduce the dense path's match-constant
        gradients (reference emd.py:17-22 / emd_kernel.cu:287-400) for BOTH
        inputs, including through the padding path."""
        from vn_pointcloudcompletion_tpu.ops.emd import (
            earth_mover_distance,
            earth_mover_distance_blocked,
        )

        a = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.standard_normal((2, m, 3)).astype(np.float32) * 0.3)

        g_dense = jax.grad(lambda x, y: earth_mover_distance(x, y).sum(),
                           argnums=(0, 1))(a, b)
        g_block = jax.grad(
            lambda x, y: earth_mover_distance_blocked(x, y, 32).sum(),
            argnums=(0, 1))(a, b)
        for gd, gb in zip(g_dense, g_block):
            scale = np.abs(np.asarray(gd)).max()
            np.testing.assert_allclose(
                np.asarray(gb), np.asarray(gd), atol=2e-4 * max(scale, 1e-6)
            )

    @pytest.mark.parametrize("n,m", [(64, 64), (100, 72), (256, 256)])
    def test_fused_pallas_matches_streamed(self, rng, n, m):
        """The fused-annealing Pallas program (ops/emd_pallas.py, interpret
        on CPU) must reproduce the streamed XLA path's full contract —
        cost AND all four match moments of the custom VJP — including
        through the padding path (non-TR-multiple sizes)."""
        from vn_pointcloudcompletion_tpu.ops.emd import _emd_blocked_impl
        from vn_pointcloudcompletion_tpu.ops.emd_pallas import (
            emd_rounds_pallas,
        )

        from vn_pointcloudcompletion_tpu.ops.emd import approx_match_reference

        a = jnp.asarray(rng.standard_normal((2, n, 3)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.standard_normal((2, m, 3)).astype(np.float32) * 0.3)
        want = _emd_blocked_impl(a, b, 32)
        got = emd_rounds_pallas(a, b, interpret=True)
        # f64 oracle moments: s_n[k] = sum_l match[l,k], t_n[k] = sum_l
        # match[l,k]*xyz2[l] (and the column-side pair from match.T)
        match = approx_match_reference(a, b)            # (B, M, N) f64
        an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
        oracle = (
            None,
            match.sum(axis=1),
            np.einsum("bmn,bmd->bnd", match, bn),
            match.sum(axis=2),
            np.einsum("bmn,bnd->bmd", match, an),
        )
        for g, w, o, name in zip(got, want, oracle,
                                 ("cost", "s_n", "t_n", "s_m", "t_m")):
            assert g.shape == w.shape, name
            scale = max(float(np.abs(np.asarray(w)).max()), 1e-6)
            if name == "cost":
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), atol=2e-4 * scale,
                    err_msg=name,
                )
                continue
            # exp(level*d) at |level|=4^7 amplifies f32 distance round-off
            # by ~|level|*ulp, so two valid f32 paths legitimately differ
            # by ~1e-3 rel on near-tie entries; pin agreement loosely and
            # accuracy vs the f64 oracle tightly (no worse than the
            # streamed path, up to the same amplification head-room)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), atol=1e-2 * scale, err_msg=name
            )
            err_stream = float(np.abs(np.asarray(w) - o).max())
            err_fused = float(np.abs(np.asarray(g) - o).max())
            # the kernel's thin ratio-sum dots run 2-way-split bf16
            # (2^-16 operand grade, measured ~25x annealing-feedback
            # amplification on the per-point t moments — a deliberate
            # speed/accuracy point, see ops/emd_pallas.py::thin_dot);
            # supplies and cost are tie/feedback-robust and stay tight
            floor = 3e-3 * scale if name[0] == "t" else 2e-4 * scale
            assert err_fused <= 3.0 * err_stream + floor, (
                name, err_fused, err_stream,
            )

    def test_fused_dispatch_and_gradients(self, rng, monkeypatch):
        """With VN_EMD_FUSED=1 the blocked entrypoint routes eligible shapes
        through the Pallas program (interpret off-TPU); the custom VJP's
        gradients must match the streamed path's."""
        monkeypatch.setenv("VN_EMD_FUSED", "1")
        from vn_pointcloudcompletion_tpu.ops.emd import (
            earth_mover_distance_blocked,
        )

        n = 1024  # smallest fused-eligible square (n*m >= 1<<20)
        a = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.standard_normal((1, n, 3)).astype(np.float32) * 0.3)
        val_f, grads_f = jax.value_and_grad(
            lambda x, y: earth_mover_distance_blocked(x, y).sum(),
            argnums=(0, 1))(a, b)
        monkeypatch.setenv("VN_EMD_FUSED", "0")
        val_s, grads_s = jax.value_and_grad(
            lambda x, y: earth_mover_distance_blocked(x, y).sum(),
            argnums=(0, 1))(a, b)
        np.testing.assert_allclose(float(val_f), float(val_s), rtol=2e-4)
        for gf, gs in zip(grads_f, grads_s):
            scale = max(float(np.abs(np.asarray(gs)).max()), 1e-6)
            # gradient noise floor from the 2-way-split thin dots (see
            # the oracle test above) — ~1e-3*scale on per-point moments
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gs), atol=5e-3 * scale
            )

    def test_blocked_trainable_at_dense_sizes_loss_path(self, rng):
        """coarse_loss='emd' routes to the blocked path above 2048^2 and is
        differentiable there (no (M, N) match in HBM)."""
        from vn_pointcloudcompletion_tpu.metrics.losses import emd_loss

        a = jnp.asarray(rng.standard_normal((1, 4096, 3)).astype(np.float32) * 0.3)
        b = jnp.asarray(rng.standard_normal((1, 4096, 3)).astype(np.float32) * 0.3)
        val, grad = jax.value_and_grad(lambda x: emd_loss(x, b))(a)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0
