"""Voxel -> OBJ export: vectorised path vs a naive per-voxel oracle."""

import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.utils.obj_io import (
    _CUBE_FACES,
    _CUBE_VERTS,
    voxel2mesh,
    voxel2obj,
)


def naive_voxel2mesh(voxels, surface_view=True, threshold=0.3):
    """Slow, obviously-correct oracle: per-voxel loop with a clamped-window
    all-neighbours-occupied hidden test."""
    occ = np.asarray(voxels) > threshold
    nx, ny, nz = occ.shape
    verts, faces, cur = [], [], 0
    for i, j, k in zip(*np.where(occ)):
        window = occ[max(i - 1, 0):i + 2, max(j - 1, 0):j + 2,
                     max(k - 1, 0):k + 2]
        hidden = window.size == 27 and window.all()
        if not surface_view or not hidden:
            verts.extend(0.01 * (_CUBE_VERTS + 1.1 * np.array([[i, j, k]])))
            faces.extend(_CUBE_FACES + cur)
            cur += 8
    return np.array(verts), np.array(faces)


@pytest.mark.parametrize("surface_view", [True, False])
def test_matches_naive_oracle(surface_view, rng):
    vox = rng.random((9, 9, 9)).astype(np.float32)
    vox[vox < 0.55] = 0.0  # mix of empty / sub-threshold / occupied
    v, f = voxel2mesh(vox, surface_view=surface_view)
    v_ref, f_ref = naive_voxel2mesh(vox, surface_view=surface_view)
    np.testing.assert_allclose(v, v_ref, atol=1e-12)
    np.testing.assert_array_equal(f, f_ref)


def test_solid_block_surface_only():
    vox = np.ones((5, 5, 5), dtype=np.float32)
    v, f = voxel2mesh(vox, surface_view=True)
    # 5^3 - 3^3 interior = 98 exposed voxels
    assert len(v) == 98 * 8 and len(f) == 98 * 12
    v_all, _ = voxel2mesh(vox, surface_view=False)
    assert len(v_all) == 125 * 8


def test_empty_grid_and_file_roundtrip(tmp_path):
    v, f = voxel2mesh(np.zeros((4, 4, 4)))
    assert len(v) == 0 and len(f) == 0
    vox = np.zeros((4, 4, 4))
    vox[1, 2, 3] = 1.0
    path = str(tmp_path / "out.obj")
    voxel2obj(path, vox)
    lines = open(path).read().splitlines()
    assert lines[0] == "g" and lines[1] == "# 8 vertex"
    assert lines[2].startswith("v ")
    assert sum(ln.startswith("f ") for ln in lines) == 12
    # face indices are 1-based and within the vertex count
    idx = np.array([ln.split()[1:] for ln in lines if ln.startswith("f ")],
                   dtype=int)
    assert idx.min() >= 1 and idx.max() <= 8
