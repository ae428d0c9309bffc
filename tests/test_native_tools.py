"""Native C++ tool tests (skipped when the tools aren't built)."""

import os
import struct
import subprocess

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
LIB = os.path.abspath(os.path.join(TOOLS, "libfastply.so"))
SAMPLER = os.path.abspath(os.path.join(TOOLS, "mesh_sampling"))

from vn_pointcloudcompletion_tpu.data import fastply_binding, read_ply_points, write_ply_points


@pytest.mark.skipif(not os.path.exists(LIB), reason="libfastply not built")
class TestFastPly:
    def test_matches_numpy_reader(self, tmp_path, rng):
        pts = rng.standard_normal((1000, 3)).astype(np.float32)
        p = str(tmp_path / "a.ply")
        write_ply_points(p, pts)
        out = fastply_binding.read_points(p)
        assert out is not None
        np.testing.assert_array_equal(out, pts)

    def test_extra_properties(self, tmp_path, rng):
        p = str(tmp_path / "b.ply")
        data = np.zeros(7, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                   ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4")])
        xyz = rng.standard_normal((7, 3)).astype(np.float32)
        data["x"], data["y"], data["z"] = xyz.T
        with open(p, "wb") as f:
            f.write(
                b"ply\nformat binary_little_endian 1.0\nelement vertex 7\n"
                b"property float x\nproperty float y\nproperty float z\n"
                b"property float nx\nproperty float ny\nproperty float nz\n"
                b"end_header\n" + data.tobytes()
            )
        out = fastply_binding.read_points(p)
        np.testing.assert_allclose(out, xyz)

    def test_corrupt_file_returns_none(self, tmp_path):
        p = str(tmp_path / "bad.ply")
        with open(p, "wb") as f:
            f.write(b"not a ply file at all")
        assert fastply_binding.read_points(p) is None


@pytest.mark.skipif(not os.path.exists(SAMPLER), reason="mesh_sampling not built")
class TestMeshSampling:
    def _write_cube_obj(self, path):
        # unit cube, 12 triangles
        v = [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)]
        faces = [
            (1, 2, 4), (1, 4, 3), (5, 8, 6), (5, 7, 8),
            (1, 6, 2), (1, 5, 6), (3, 4, 8), (3, 8, 7),
            (1, 3, 7), (1, 7, 5), (2, 8, 4), (2, 6, 8),
        ]
        with open(path, "w") as f:
            for x, y, z in v:
                f.write(f"v {x} {y} {z}\n")
            for a, b, c in faces:
                f.write(f"f {a} {b} {c}\n")

    def test_samples_on_cube_surface(self, tmp_path):
        obj = str(tmp_path / "cube.obj")
        ply = str(tmp_path / "cube.ply")
        self._write_cube_obj(obj)
        subprocess.run(
            [SAMPLER, obj, ply, "-n_samples", "5000"], check=True,
            capture_output=True,
        )
        pts = read_ply_points(ply)
        assert pts.shape == (5000, 3)
        assert pts.min() >= -1e-6 and pts.max() <= 1 + 1e-6
        # every sample lies on a face: at least one coord is ~0 or ~1
        on_face = np.any((np.abs(pts) < 1e-5) | (np.abs(pts - 1) < 1e-5), axis=1)
        assert on_face.all()

    def test_voxel_downsample(self, tmp_path):
        obj = str(tmp_path / "cube.obj")
        ply = str(tmp_path / "cube_ds.ply")
        self._write_cube_obj(obj)
        subprocess.run(
            [SAMPLER, obj, ply, "-n_samples", "20000", "-leaf_size", "0.25"],
            check=True, capture_output=True,
        )
        pts = read_ply_points(ply)
        # 4^3 grid over a cube surface: at most ~6*16+edges cells remain
        assert 20 < pts.shape[0] < 200
