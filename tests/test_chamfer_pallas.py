"""Pallas chamfer kernel parity (interpret mode on CPU) vs the dense oracle."""

import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.ops.chamfer import chamfer_distance_reference
from vn_pointcloudcompletion_tpu.ops.chamfer_pallas import nn_one_sided_pallas
from vn_pointcloudcompletion_tpu.ops.chamfer_pallas_bidir import (
    nn_bidirectional_pallas,
)


class TestPallasChamfer:
    @pytest.mark.parametrize("n,m", [(700, 1300), (512, 1024), (100, 60)])
    def test_matches_oracle(self, rng, n, m):
        x = rng.standard_normal((2, n, 3)).astype(np.float32)
        y = rng.standard_normal((2, m, 3)).astype(np.float32)
        d, i = nn_one_sided_pallas(x, y, interpret=True)
        rd, _, ri, _ = chamfer_distance_reference(x, y)
        np.testing.assert_allclose(np.asarray(d), rd, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), ri)

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
        # m far from a tile multiple; padded columns must not appear as matches
        x = rng.standard_normal((1, 520, 3)).astype(np.float32) * 100
        y = rng.standard_normal((1, 1025, 3)).astype(np.float32) * 100
        d, i = nn_one_sided_pallas(x, y, interpret=True)
        assert int(np.asarray(i).max()) < 1025
        assert np.isfinite(np.asarray(d)).all()


class TestBwdSweep:
    """Fused gather + moment-scatter backward sweep vs dense formulas."""

    @pytest.mark.parametrize("n,m", [(600, 2048), (512, 2500), (70, 40)])
    def test_matches_dense(self, rng, n, m):
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.ops.chamfer_pallas_bwd import (
            chamfer_bwd_sweep,
        )

        b = 2
        y = rng.standard_normal((b, m, 3)).astype(np.float32)
        g = rng.standard_normal((b, m)).astype(np.float32)
        i1 = rng.integers(0, m, (b, n)).astype(np.int32)
        i2 = rng.integers(0, n, (b, m)).astype(np.int32)
        y_nn, t, s = chamfer_bwd_sweep(y, g, jnp.asarray(i1), jnp.asarray(i2),
                                       interpret=True)

        ref_nn = np.take_along_axis(y, i1[..., None], axis=1)
        ref_t = np.zeros((b, n, 3), np.float32)
        ref_s = np.zeros((b, n, 1), np.float32)
        for bi in range(b):
            for mi in range(m):
                ref_t[bi, i2[bi, mi]] += g[bi, mi] * y[bi, mi]
                ref_s[bi, i2[bi, mi], 0] += g[bi, mi]
        np.testing.assert_allclose(np.asarray(y_nn), ref_nn, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), ref_t, atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-4, rtol=1e-4)
