"""Partial-view renderer tests: hidden-point removal semantics."""

import numpy as np

from vn_pointcloudcompletion_tpu.data.render import (
    generate_partials,
    look_at,
    render_partial,
)


class TestRenderer:
    def _sphere(self, rng, n=20000, r=0.3):
        v = rng.standard_normal((n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return (v * r).astype(np.float32)

    def test_partial_is_subset(self, rng):
        pts = self._sphere(rng)
        part = render_partial(pts, np.array([1.0, 0.0, 0.0]))
        assert 0 < len(part) < len(pts)
        # every partial point is one of the originals (indices, not resampled)
        pts_set = {p.tobytes() for p in pts}
        assert all(p.tobytes() in pts_set for p in part[:200])

    def test_back_of_sphere_hidden(self, rng):
        pts = self._sphere(rng)
        eye = np.array([1.0, 0.0, 0.0])
        part = render_partial(pts, eye)
        # almost all visible points lie on the camera-facing hemisphere
        frac_front = float(np.mean(part[:, 0] > 0))
        assert frac_front > 0.9

    def test_look_at_is_rotation(self):
        r = look_at(np.array([1.0, 2.0, 3.0]), np.zeros(3))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)

    def test_generate_8_views(self, rng):
        pts = self._sphere(rng, n=5000)
        partials = generate_partials(pts, n_views=8, seed=1)
        assert len(partials) == 8
        for p in partials:
            assert 100 < len(p) < 5000
        # distinct viewpoints give distinct scans
        assert len(partials[0]) != len(partials[1]) or not np.array_equal(
            partials[0][:50], partials[1][:50]
        )
