"""Loss/metric semantics tests vs straightforward NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.metrics import (
    cd_loss_l1,
    cd_loss_l2,
    emd_loss,
    calc_cd,
    calc_dcd,
    l1_cd,
    l2_cd,
    f_score,
    voxel_iou,
    points_to_voxels,
)
from vn_pointcloudcompletion_tpu.ops.chamfer import chamfer_distance_reference


def dense_cd(x, y):
    diff = x[:, :, None, :] - y[:, None, :, :]
    return np.sum(diff * diff, axis=-1)


class TestChamferLosses:
    def test_cd_l1_l2_formulas(self, rng):
        x = rng.standard_normal((2, 50, 3)).astype(np.float32)
        y = rng.standard_normal((2, 70, 3)).astype(np.float32)
        d = dense_cd(x, y)
        d1, d2 = d.min(axis=2), d.min(axis=1)
        np.testing.assert_allclose(
            cd_loss_l1(x, y),
            (np.sqrt(d1).mean() + np.sqrt(d2).mean()) / 2,
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            cd_loss_l2(x, y), d1.mean() + d2.mean(), rtol=1e-5
        )

    def test_l1_grad_finite_at_exact_match(self, rng):
        # the 448-contract appends FPS-sampled INPUT points to the coarse
        # output, so predicted points coincide with gt to machine zero;
        # d/dd sqrt(d) = inf there would NaN every parameter in one step
        # (losses._sqrt0 pins the subgradient to 0)
        import jax
        import jax.numpy as jnp

        y = jnp.asarray(rng.standard_normal((1, 40, 3)).astype(np.float32))
        x = y[:, :20]  # every predicted point matches a gt point exactly

        g = jax.grad(lambda x: cd_loss_l1(x, y))(x)
        assert np.isfinite(np.asarray(g)).all()

        from vn_pointcloudcompletion_tpu.metrics.losses import calc_cd

        def cdp(x):
            cd_p, _ = calc_cd(x, y)
            return cd_p.sum()

        g2 = jax.grad(cdp)(x)
        assert np.isfinite(np.asarray(g2)).all()

    def test_batch_sums(self, rng):
        x = rng.standard_normal((3, 50, 3)).astype(np.float32)
        y = rng.standard_normal((3, 70, 3)).astype(np.float32)
        d = dense_cd(x, y)
        d1, d2 = d.min(axis=2), d.min(axis=1)
        np.testing.assert_allclose(
            l1_cd(x, y),
            np.sum(np.sqrt(d1).mean(1) + np.sqrt(d2).mean(1)) / 2,
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            l2_cd(x, y), np.sum(d1.mean(1) + d2.mean(1)), rtol=1e-5
        )

    def test_calc_cd_argument_order(self, rng):
        # reference computes chamfer(gt, output): dist1 spans gt points
        out = rng.standard_normal((2, 30, 3)).astype(np.float32)
        gt = rng.standard_normal((2, 50, 3)).astype(np.float32)
        cd_p, cd_t, dist1, dist2, idx1, idx2 = calc_cd(out, gt, return_raw=True)
        assert dist1.shape == (2, 50) and dist2.shape == (2, 30)
        rd1, rd2, ri1, ri2 = chamfer_distance_reference(gt, out)
        np.testing.assert_allclose(dist1, rd1, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx1), ri1)


class TestDCD:
    def test_dcd_against_loop_reference(self, rng):
        x = rng.standard_normal((2, 40, 3)).astype(np.float32) * 0.3
        gt = rng.standard_normal((2, 60, 3)).astype(np.float32) * 0.3
        alpha, n_lambda = 200, 0.5
        loss, _, _ = calc_dcd(x, gt, alpha=alpha, n_lambda=n_lambda)

        # per-batch python loop reference (metrics/loss.py:97-112)
        d = dense_cd(gt, x)  # chamfer(gt, x): dist1 over gt
        dist1, idx1 = d.min(axis=2), d.argmin(axis=2)
        dist2, idx2 = d.min(axis=1), d.argmin(axis=1)
        n_x, n_gt = 40, 60
        frac_12, frac_21 = n_x / n_gt, n_gt / n_x
        expected = []
        for b in range(2):
            c1 = np.bincount(idx1[b], minlength=n_x)
            w1 = (c1[idx1[b]].astype(np.float64) ** n_lambda + 1e-6) ** -1 * frac_21
            l1 = (-np.exp(-dist1[b] * alpha) * w1 + 1).mean()
            c2 = np.bincount(idx2[b], minlength=n_gt)
            w2 = (c2[idx2[b]].astype(np.float64) ** n_lambda + 1e-6) ** -1 * frac_12
            l2 = (-np.exp(-dist2[b] * alpha) * w2 + 1).mean()
            expected.append((l1 + l2) / 2)
        np.testing.assert_allclose(loss, expected, rtol=1e-4)


class TestEMDLoss:
    def test_emd_zero_for_identical(self, rng):
        x = rng.standard_normal((2, 32, 3)).astype(np.float32) * 0.1
        assert float(emd_loss(x, x)) < 1e-3


class TestFScore:
    def test_perfect_prediction(self, rng):
        x = rng.standard_normal((2, 100, 3)).astype(np.float32)
        np.testing.assert_allclose(f_score(x, x), 1.0, atol=1e-6)

    def test_far_prediction_zero(self, rng):
        x = rng.standard_normal((1, 50, 3)).astype(np.float32)
        y = x + 100.0
        np.testing.assert_allclose(f_score(x, y), 0.0, atol=1e-6)


class TestVoxelIoU:
    def test_identical_clouds(self, rng):
        x = rng.standard_normal((500, 3)).astype(np.float32)
        np.testing.assert_allclose(voxel_iou(x, x), 1.0)

    def test_occupancy_counts(self):
        # 8 cube corners occupy exactly 8 voxels in a 2^3 grid
        pts = np.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            np.float32,
        )
        grid = np.asarray(points_to_voxels(pts, 2))
        assert grid.sum() == 8

    def test_iou_is_per_own_bbox(self, rng):
        """Pins the convention (PyntCloud / reference voxel_util.py:89-105):
        each cloud voxelizes in its OWN bounding box, so a rigid translation
        leaves IoU at 1 — disjoint clouds are NOT penalized for position."""
        a = rng.random((200, 3)).astype(np.float32)
        b = a + np.array([10.0, 0, 0], np.float32)
        np.testing.assert_allclose(voxel_iou(a, b), 1.0, atol=0.35)
