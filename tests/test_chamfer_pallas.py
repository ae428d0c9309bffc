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
