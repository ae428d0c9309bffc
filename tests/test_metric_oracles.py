"""Oracle pins for voxel-IoU and F-score semantics (VERDICT r2 #5).

The reference computes voxel IoU through PyntCloud's regular voxelgrid
(``/root/reference/utils/voxel_util.py:89-105``) and F-score through open3d
point-cloud distances (``/root/reference/metrics/metric.py:31-48``).  Neither
library is in this image, so each test pins the jitted implementation against
a vendored NumPy transliteration of the library's semantics — the reference's
own oracle pattern (unit_test.py:14-35) — plus skipif-guarded checks against
the real libraries when available.

The binning-edge cases (points exactly ON voxel boundaries, short-axis
bounding boxes) are the ones a convention mismatch (floor-vs-searchsorted,
regular-vs-tight bbox) would silently shift.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.metrics.metrics import (
    f_score,
    points_to_voxels,
    voxel_iou,
)


def pyntcloud_voxelgrid_oracle(points: np.ndarray, n: int = 64) -> np.ndarray:
    """NumPy transliteration of PyntCloud VoxelGrid.compute with the default
    regular_bounding_box=True (pyntcloud/structures/voxelgrid.py):

    - bbox expanded symmetrically per axis so all sides equal the longest,
    - per-axis ``segments = linspace(lo, hi, n + 1)``,
    - ``voxel = clip(searchsorted(segments, x, side='left') - 1, 0, n - 1)``
      (a point exactly on an interior boundary lands in the LOWER voxel),
    - occupancy grid of shape (n, n, n), True where any point landed.
    """
    points = np.asarray(points, dtype=np.float64)
    xyzmin = points.min(axis=0)
    xyzmax = points.max(axis=0)
    margin = (xyzmax - xyzmin).max() - (xyzmax - xyzmin)
    xyzmin = xyzmin - margin / 2
    xyzmax = xyzmax + margin / 2
    grid = np.zeros((n, n, n), dtype=bool)
    idx = np.empty((len(points), 3), dtype=np.int64)
    for axis in range(3):
        segments = np.linspace(xyzmin[axis], xyzmax[axis], num=n + 1)
        idx[:, axis] = np.clip(
            np.searchsorted(segments, points[:, axis], side="left") - 1,
            0, n - 1,
        )
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return grid


def open3d_fscore_oracle(pred: np.ndarray, gt: np.ndarray, th=0.01) -> float:
    """NumPy transliteration of the reference f_score (metric.py:31-48):
    open3d ``compute_point_cloud_distance`` = exact euclidean NN distance;
    precision/recall use a STRICT < threshold; zero denominator -> 0."""
    d = np.sqrt(
        ((pred[:, None, :] - gt[None, :, :]) ** 2).sum(-1)
    )
    dist1 = d.min(axis=1)  # pred -> gt
    dist2 = d.min(axis=0)  # gt -> pred
    precision = float((dist1 < th).sum()) / len(dist1)
    recall = float((dist2 < th).sum()) / len(dist2)
    if recall + precision == 0:
        return 0.0
    return 2 * recall * precision / (recall + precision)


class TestVoxelOracle:
    def test_random_clouds_match_oracle(self, rng):
        for _ in range(3):
            pts = rng.standard_normal((500, 3)).astype(np.float32) * 0.3
            got = np.asarray(points_to_voxels(jnp.asarray(pts), 64))
            want = pyntcloud_voxelgrid_oracle(pts, 64)
            assert (got == want).all()

    def test_boundary_points_go_to_lower_voxel(self):
        # exact cube bbox [0, 4]^3, n=4: boundaries at 1, 2, 3 are exactly
        # representable, so both implementations must agree bit-for-bit
        n = 4
        pts = np.array([
            [0.0, 0.0, 0.0],   # min corner -> voxel 0
            [4.0, 4.0, 4.0],   # max corner -> voxel 3
            [1.0, 2.0, 3.0],   # interior boundaries -> LOWER voxel (0,1,2)
            [2.0, 2.0, 2.0],
            [3.5, 0.5, 0.5],   # mid-voxel control in a voxel of its own
        ], dtype=np.float32)
        got = np.asarray(points_to_voxels(jnp.asarray(pts), n))
        want = pyntcloud_voxelgrid_oracle(pts, n)
        assert (got == want).all()
        # the convention itself, explicitly:
        assert got[0, 1, 2]      # (1.0, 2.0, 3.0) -> (0, 1, 2), not (1, 2, 3)
        assert not got[1, 2, 3]
        assert got[1, 1, 1]      # (2,2,2) -> lower voxel 1 on every axis
        assert got[3, 0, 0]      # mid-voxel control (3.5,0.5,0.5), no
        assert not got[2, 0, 0]  # boundary ambiguity possible

    def test_short_axis_bbox_is_regular(self):
        # y/z ranges are half the x range: the voxelgrid must still be cubic
        # (PyntCloud regular_bounding_box), centring the short axes
        n = 8
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 1, (400, 3)).astype(np.float32)
        pts[:, 1] *= 0.5
        pts[:, 2] *= 0.25
        got = np.asarray(points_to_voxels(jnp.asarray(pts), n))
        want = pyntcloud_voxelgrid_oracle(pts, n)
        assert (got == want).all()
        # occupancy confined to the central band of the short axes (both
        # land in voxels 2..5 of 8 after the cube expansion); the extremes
        # must stay empty — a tight (non-regular) bbox would fill 0..7
        assert not got[:, :2, :].any() and not got[:, 6:, :].any()
        assert not got[:, :, :2].any() and not got[:, :, 6:].any()

    def test_voxel_iou_matches_reference_formula(self, rng):
        a = rng.standard_normal((300, 3)).astype(np.float32) * 0.3
        b = (a + rng.standard_normal((300, 3)).astype(np.float32) * 0.05)
        got = float(voxel_iou(jnp.asarray(a), jnp.asarray(b), 32))
        va = pyntcloud_voxelgrid_oracle(a, 32)
        vb = pyntcloud_voxelgrid_oracle(b, 32)
        want = np.logical_and(va, vb).sum() / np.logical_or(va, vb).sum()
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_against_real_pyntcloud_if_available(self, rng):
        pyntcloud = pytest.importorskip("pyntcloud")
        import pandas as pd

        pts = rng.standard_normal((400, 3)).astype(np.float32) * 0.3
        cloud = pyntcloud.PyntCloud(
            pd.DataFrame(pts, columns=["x", "y", "z"])
        )
        vg_id = cloud.add_structure("voxelgrid", n_x=32, n_y=32, n_z=32)
        vg = cloud.structures[vg_id]
        want = np.zeros((32, 32, 32), dtype=bool)
        want[vg.voxel_x, vg.voxel_y, vg.voxel_z] = True
        got = np.asarray(points_to_voxels(jnp.asarray(pts), 32))
        assert (got == want).all()


class TestFScoreOracle:
    def test_random_clouds_match_oracle(self, rng):
        pred = rng.standard_normal((1, 256, 3)).astype(np.float32) * 0.1
        gt = pred + rng.standard_normal((1, 256, 3)).astype(np.float32) * 0.01
        got = float(f_score(jnp.asarray(pred), jnp.asarray(gt), 0.01)[0])
        want = open3d_fscore_oracle(pred[0], gt[0], 0.01)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_threshold_is_strict_less_than(self):
        # pred point exactly at distance == th from its nearest gt point must
        # NOT count (metric.py:47 uses <, not <=)
        pred = np.zeros((1, 1, 3), dtype=np.float32)
        gt = np.array([[[0.01, 0.0, 0.0]]], dtype=np.float32)
        got = float(f_score(jnp.asarray(pred), jnp.asarray(gt), 0.01)[0])
        assert got == 0.0 == open3d_fscore_oracle(pred[0], gt[0], 0.01)

    def test_zero_denominator_returns_zero(self):
        pred = np.zeros((1, 4, 3), dtype=np.float32)
        gt = np.ones((1, 4, 3), dtype=np.float32)
        got = float(f_score(jnp.asarray(pred), jnp.asarray(gt), 0.01)[0])
        assert got == 0.0 == open3d_fscore_oracle(pred[0], gt[0], 0.01)

    def test_against_real_open3d_if_available(self, rng):
        o3d = pytest.importorskip("open3d")

        pred = rng.standard_normal((300, 3)) * 0.1
        gt = pred + rng.standard_normal((300, 3)) * 0.01
        p = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(pred))
        g = o3d.geometry.PointCloud(o3d.utility.Vector3dVector(gt))
        d1 = p.compute_point_cloud_distance(g)
        d2 = g.compute_point_cloud_distance(p)
        precision = float(sum(d < 0.01 for d in d1)) / len(d1)
        recall = float(sum(d < 0.01 for d in d2)) / len(d2)
        want = (2 * recall * precision / (recall + precision)
                if recall + precision else 0.0)
        got = float(f_score(
            jnp.asarray(pred[None].astype(np.float32)),
            jnp.asarray(gt[None].astype(np.float32)), 0.01,
        )[0])
        np.testing.assert_allclose(got, want, rtol=1e-6)
