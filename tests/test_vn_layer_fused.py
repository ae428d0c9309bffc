"""Fully-fused VN layer op vs the reference composition (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.ops.vn_fused import reference_bn_leaky_planes
from vn_pointcloudcompletion_tpu.ops.vn_layer_fused import (
    EPS,
    layer_eligible,
    vn_layer_fused,
    vn_layer_stats,
)

INTERP = jax.default_backend() != "tpu"
B, CIN, COUT, N = 2, 16, 32, 1100  # non-multiple of TN exercises padding


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, 3, CIN, N)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((COUT, CIN)) * 0.2, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((COUT, CIN)) * 0.2, jnp.float32)
    pb = jnp.asarray(rng.standard_normal((B, 3, COUT, 1)) * 0.3, jnp.float32)
    db = jnp.asarray(rng.standard_normal((B, 3, COUT, 1)) * 0.3, jnp.float32)
    a = jnp.asarray(rng.standard_normal(COUT) * 0.5 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(COUT) * 0.1, jnp.float32)
    return x, w, wd, pb, db, a, b


def _dense(x, w, wd, pb, db, a, b, ns=0.2):
    p = jnp.einsum("oc,bjcn->bjon", w, x)
    d = jnp.einsum("oc,bjcn->bjon", wd, x)
    if pb is not None:
        p = p + pb
        d = d + db
    return reference_bn_leaky_planes(p, d, a, b, ns)


def _dense_stats(x, w, pb):
    p = jnp.einsum("oc,bjcn->bjon", w, x)
    if pb is not None:
        p = p + pb
    norm = jnp.linalg.norm(p, axis=1) + EPS  # (B, C, N)
    return jnp.sum(norm, axis=(0, 2)), jnp.sum(norm * norm, axis=(0, 2))


class TestForward:
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_matches_dense(self, data, with_bias):
        x, w, wd, pb, db, a, b = data
        if not with_bias:
            pb = db = None
        got = vn_layer_fused(x, w, wd, pb, db, a, b, 0.2, False, INTERP)
        want = _dense(x, w, wd, pb, db, a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_stats_match_dense(self, data, with_bias):
        x, w, _, pb, _, _, _ = data
        if not with_bias:
            pb = None
        s1, s2 = vn_layer_stats(x, w, pb, False, INTERP)
        r1, r2 = _dense_stats(x, w, pb)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), rtol=2e-5)


class TestBackward:
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_grads_match_autodiff(self, data, with_bias):
        x, w, wd, pb, db, a, b = data
        if not with_bias:
            pb = db = None
        rng = np.random.default_rng(3)
        g = jnp.asarray(rng.standard_normal((B, 3, COUT, N)), jnp.float32)

        def loss_fused(*args):
            return jnp.sum(vn_layer_fused(*args, 0.2, False, INTERP) * g)

        def loss_dense(*args):
            return jnp.sum(_dense(*args) * g)

        argnums = (0, 1, 2, 5, 6) if not with_bias else (0, 1, 2, 3, 4, 5, 6)
        gf = jax.grad(loss_fused, argnums=argnums)(x, w, wd, pb, db, a, b)
        gd = jax.grad(loss_dense, argnums=argnums)(x, w, wd, pb, db, a, b)
        for got, want in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=3e-4)

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_stats_grads_match_autodiff(self, data, with_bias):
        x, w, _, pb, _, _, _ = data
        if not with_bias:
            pb = None
        c1 = jnp.linspace(0.5, 1.5, COUT)
        c2 = jnp.linspace(-0.5, 0.5, COUT)

        def loss_fused(*args):
            s1, s2 = vn_layer_stats(*args, False, INTERP)
            return jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        def loss_dense(*args):
            s1, s2 = _dense_stats(*args)
            return jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        argnums = (0, 1) if not with_bias else (0, 1, 2)
        gf = jax.grad(loss_fused, argnums=argnums)(x, w, pb)
        gd = jax.grad(loss_dense, argnums=argnums)(x, w, pb)
        for got, want in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=3e-4)


class TestGroupBias:
    """group=S mode: per-group bias columns expanded in-register."""

    S = 16
    NG = 1100 // 16 * 16  # N must be a multiple of S for the group layout

    def _data(self):
        rng = np.random.default_rng(13)
        n = self.NG
        x = jnp.asarray(rng.standard_normal((B, 3, CIN, n)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((COUT, CIN)) * 0.2, jnp.float32)
        wd = jnp.asarray(rng.standard_normal((COUT, CIN)) * 0.2, jnp.float32)
        pb = jnp.asarray(
            rng.standard_normal((B, 3, COUT, n // self.S)) * 0.3, jnp.float32)
        db = jnp.asarray(
            rng.standard_normal((B, 3, COUT, n // self.S)) * 0.3, jnp.float32)
        a = jnp.asarray(rng.standard_normal(COUT) * 0.5 + 1.0, jnp.float32)
        b = jnp.asarray(rng.standard_normal(COUT) * 0.1, jnp.float32)
        return x, w, wd, pb, db, a, b

    @staticmethod
    def _expand(bias, s):
        bsz, _, c, g = bias.shape
        e = jnp.broadcast_to(bias[..., None], (bsz, 3, c, g, s))
        return e.reshape(bsz, 3, c, g * s)

    def test_forward_matches_dense(self):
        x, w, wd, pb, db, a, b = self._data()
        got = vn_layer_fused(x, w, wd, pb, db, a, b, 0.2, False, INTERP, self.S)
        want = _dense(x, w, wd, self._expand(pb, self.S),
                      self._expand(db, self.S), a, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_stats_match_dense(self):
        x, w, _, pb, _, _, _ = self._data()
        s1, s2 = vn_layer_stats(x, w, pb, False, INTERP, self.S)
        r1, r2 = _dense_stats(x, w, self._expand(pb, self.S))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), rtol=2e-5)

    def test_grads_match_autodiff(self):
        x, w, wd, pb, db, a, b = self._data()
        rng = np.random.default_rng(17)
        g = jnp.asarray(
            rng.standard_normal((B, 3, COUT, self.NG)), jnp.float32)

        def loss_fused(x, w, wd, pb, db, a, b):
            return jnp.sum(
                vn_layer_fused(x, w, wd, pb, db, a, b, 0.2, False, INTERP,
                               self.S) * g)

        def loss_dense(x, w, wd, pb, db, a, b):
            return jnp.sum(_dense(x, w, wd, self._expand(pb, self.S),
                                  self._expand(db, self.S), a, b) * g)

        argnums = (0, 1, 2, 3, 4, 5, 6)
        gf = jax.grad(loss_fused, argnums=argnums)(x, w, wd, pb, db, a, b)
        gd = jax.grad(loss_dense, argnums=argnums)(x, w, wd, pb, db, a, b)
        for got, want in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=3e-4)

    def test_stats_grads_match_autodiff(self):
        x, w, _, pb, _, _, _ = self._data()
        c1 = jnp.linspace(0.5, 1.5, COUT)
        c2 = jnp.linspace(-0.5, 0.5, COUT)

        def loss_fused(x, w, pb):
            s1, s2 = vn_layer_stats(x, w, pb, False, INTERP, self.S)
            return jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        def loss_dense(x, w, pb):
            s1, s2 = _dense_stats(x, w, self._expand(pb, self.S))
            return jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, pb)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(x, w, pb)
        for got, want in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=3e-4)


class TestEligibility:
    def test_gate(self):
        x_ok = jnp.zeros((2, 3, 256, 16384))
        assert layer_eligible(x_ok, 256)
        assert not layer_eligible(x_ok, 256, share_nonlinearity=True)
        assert not layer_eligible(jnp.zeros((2, 3, 1024, 2048)), 1024)  # FLOP-dense
        assert not layer_eligible(jnp.zeros((2, 3, 256, 2048)), 256)  # small N


class TestBf16Mode:
    def test_bf16_flag_tracks_f32_path(self, data):
        # wiring sanity: the bf16 kernel path (bf16 matmul rounding through
        # bf16 pre-activations) must agree with the f32 path to bf16 epsilon
        x, w, wd, pb, db, a, b = data
        f32 = vn_layer_fused(x, w, wd, pb, db, a, b, 0.2, False, INTERP)
        b16 = vn_layer_fused(x, w, wd, pb, db, a, b, 0.2, True, INTERP)
        np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                                   atol=0.15, rtol=0.08)
        s1a, _ = vn_layer_stats(x, w, pb, False, INTERP)
        s1b, _ = vn_layer_stats(x, w, pb, True, INTERP)
        np.testing.assert_allclose(np.asarray(s1b), np.asarray(s1a), rtol=0.02)


class TestProjectedLayer:
    """Fused layer + in-kernel 1-channel output contraction."""

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_forward_matches_dense(self, data, with_bias):
        from vn_pointcloudcompletion_tpu.ops.vn_layer_fused import (
            vn_layer_fused_project,
        )

        x, w, wd, pb, db, a, b = data
        if not with_bias:
            pb = db = None
        rng = np.random.default_rng(29)
        wo = jnp.asarray(rng.standard_normal(COUT) * 0.2, jnp.float32)
        got = vn_layer_fused_project(x, w, wd, pb, db, a, b, wo,
                                     0.2, False, INTERP)
        want = jnp.einsum("c,bjcn->bjn", wo,
                          _dense(x, w, wd, pb, db, a, b))[:, :, None]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)

    @pytest.mark.parametrize("with_bias", [False, True])
    def test_grads_match_autodiff(self, data, with_bias):
        from vn_pointcloudcompletion_tpu.ops.vn_layer_fused import (
            vn_layer_fused_project,
        )

        x, w, wd, pb, db, a, b = data
        if not with_bias:
            pb = db = None
        rng = np.random.default_rng(31)
        wo = jnp.asarray(rng.standard_normal(COUT) * 0.2, jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, 3, 1, N)), jnp.float32)

        def loss_fused(x, w, wd, pb, db, a, b, wo):
            return jnp.sum(vn_layer_fused_project(
                x, w, wd, pb, db, a, b, wo, 0.2, False, INTERP) * g)

        def loss_dense(x, w, wd, pb, db, a, b, wo):
            out = jnp.einsum("c,bjcn->bjn", wo,
                             _dense(x, w, wd, pb, db, a, b))[:, :, None]
            return jnp.sum(out * g)

        argnums = ((0, 1, 2, 5, 6, 7) if not with_bias
                   else (0, 1, 2, 3, 4, 5, 6, 7))
        gf = jax.grad(loss_fused, argnums=argnums)(x, w, wd, pb, db, a, b, wo)
        gd = jax.grad(loss_dense, argnums=argnums)(x, w, wd, pb, db, a, b, wo)
        for got, want in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=3e-4)
