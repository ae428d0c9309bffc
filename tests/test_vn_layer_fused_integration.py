"""Whole-layer fused path == unfused path at module level (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.models.pcn import (
    _VNSplitFoldLayer,
    _VNSplitFoldLayerFused,
    _VNSplitPairFoldLayer,
    _VNSplitPairFoldLayerFused,
)
from vn_pointcloudcompletion_tpu.nn.vn import VNLinearLeakyReLU

B, CIN, COUT, N = 2, 16, 128, 4096  # smallest layer_eligible shape


@pytest.fixture
def x():
    rng = np.random.default_rng(11)
    return jnp.asarray(rng.standard_normal((B, 3, CIN, N)), jnp.float32)


class TestVNLinearLeakyReLULayerFused:
    def _modules(self):
        ref = VNLinearLeakyReLU(COUT, layout="plane", fused=False,
                                layer_fused=False)
        fus = VNLinearLeakyReLU(COUT, layout="plane", layer_fused=True)
        return ref, fus

    @pytest.mark.parametrize("train", [False, True])
    def test_forward_and_stats_match(self, x, train):
        ref, fus = self._modules()
        v = ref.init(jax.random.key(0), x, train=True)
        if train:
            out_r, mut_r = ref.apply(v, x, train=True, mutable=["batch_stats"])
            out_f, mut_f = fus.apply(v, x, train=True, mutable=["batch_stats"])
            r = jax.tree_util.tree_leaves(mut_r)
            f = jax.tree_util.tree_leaves(mut_f)
            for rr, ff in zip(r, f):
                np.testing.assert_allclose(rr, ff, rtol=1e-5, atol=1e-6)
        else:
            out_r = ref.apply(v, x, train=False)
            out_f = fus.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   atol=3e-5, rtol=3e-5)

    def test_param_tree_identical(self, x):
        ref, fus = self._modules()
        vr = ref.init(jax.random.key(0), x, train=True)
        vf = fus.init(jax.random.key(0), x, train=True)
        pr = jax.tree_util.tree_structure(vr)
        pf = jax.tree_util.tree_structure(vf)
        assert pr == pf

    def test_grads_match(self, x):
        ref, fus = self._modules()
        v = ref.init(jax.random.key(0), x, train=True)

        def loss(mod, params, x):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        gr = jax.grad(lambda p: loss(ref, p, x))(v["params"])
        gf = jax.grad(lambda p: loss(fus, p, x))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3, rtol=5e-3)
        gx_r = jax.grad(lambda xx: loss(ref, v["params"], xx))(x)
        gx_f = jax.grad(lambda xx: loss(fus, v["params"], xx))(x)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   atol=5e-3, rtol=5e-3)


class TestSplitFoldLayerFused:
    def _data(self):
        rng = np.random.default_rng(5)
        nd = 4096
        glob = jnp.asarray(rng.standard_normal((B, 3, 64, 1)), jnp.float32)
        seed = jnp.asarray(rng.standard_normal((B, 3, 1, nd)), jnp.float32)
        point = jnp.asarray(rng.standard_normal((B, 3, 1, nd)), jnp.float32)
        return glob, seed, point

    @pytest.mark.parametrize("train", [False, True])
    def test_forward_and_stats_match(self, train):
        glob, seed, point = self._data()
        ref = _VNSplitFoldLayer(128)
        fus = _VNSplitFoldLayerFused(128)
        v = ref.init(jax.random.key(0), glob, seed, point, train=True)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(
                    fus.init(jax.random.key(0), glob, seed, point, train=True)))
        if train:
            out_r, mut_r = ref.apply(v, glob, seed, point, train=True,
                                     mutable=["batch_stats"])
            out_f, mut_f = fus.apply(v, glob, seed, point, train=True,
                                     mutable=["batch_stats"])
            for rr, ff in zip(jax.tree_util.tree_leaves(mut_r),
                              jax.tree_util.tree_leaves(mut_f)):
                np.testing.assert_allclose(rr, ff, rtol=1e-5, atol=1e-6)
            # train-mode tolerance: var = E[n^2] - E[n]^2 amplifies the
            # tile-ordered f32 partial-sum difference by cancellation; the
            # measured tail is ~2e-4 on 0.07% of elements
            tol = 5e-4
        else:
            out_r = ref.apply(v, glob, seed, point, train=False)
            out_f = fus.apply(v, glob, seed, point, train=False)
            tol = 3e-5
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   atol=tol, rtol=tol)

    def test_grads_match(self):
        glob, seed, point = self._data()
        ref = _VNSplitFoldLayer(128)
        fus = _VNSplitFoldLayerFused(128)
        v = ref.init(jax.random.key(0), glob, seed, point, train=True)

        def loss(mod, params, glob):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                glob, seed, point, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        gr = jax.grad(lambda p: loss(ref, p, glob))(v["params"])
        gf = jax.grad(lambda p: loss(fus, p, glob))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gf)):
            a, b = np.asarray(a), np.asarray(b)
            # compare in units of the leaf's scale: the BN variance
            # cancellation amplifies tile-ordered f32 sum differences on
            # near-zero elements while the leaf norms agree to ~1e-3
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)


class TestPairFoldLayerFused:
    """Attention decoder's per-centre fold layer: group-bias Pallas path."""

    def _data(self):
        rng = np.random.default_rng(23)
        n, s = 64, 16  # 1024 grid points
        feat = jnp.asarray(rng.standard_normal((2, 3, 64, n)), jnp.float32)
        var = jnp.asarray(rng.standard_normal((2, 3, 1, n * s)), jnp.float32)
        return feat, var, s

    @pytest.mark.parametrize("train", [False, True])
    def test_forward_and_stats_match(self, train):
        feat, var, s = self._data()
        ref = _VNSplitPairFoldLayer(128)
        fus = _VNSplitPairFoldLayerFused(128)
        v = ref.init(jax.random.key(0), feat, var, s, train=True)
        assert (jax.tree_util.tree_structure(v) ==
                jax.tree_util.tree_structure(
                    fus.init(jax.random.key(0), feat, var, s, train=True)))
        if train:
            out_r, mut_r = ref.apply(v, feat, var, s, train=True,
                                     mutable=["batch_stats"])
            out_f, mut_f = fus.apply(v, feat, var, s, train=True,
                                     mutable=["batch_stats"])
            for rr, ff in zip(jax.tree_util.tree_leaves(mut_r),
                              jax.tree_util.tree_leaves(mut_f)):
                np.testing.assert_allclose(rr, ff, rtol=1e-5, atol=1e-6)
            tol = 5e-4  # var-cancellation tail, see TestSplitFoldLayerFused
        else:
            out_r = ref.apply(v, feat, var, s, train=False)
            out_f = fus.apply(v, feat, var, s, train=False)
            tol = 3e-5
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   atol=tol, rtol=tol)

    def test_grads_match(self):
        feat, var, s = self._data()
        ref = _VNSplitPairFoldLayer(128)
        fus = _VNSplitPairFoldLayerFused(128)
        v = ref.init(jax.random.key(0), feat, var, s, train=True)

        def loss(mod, params, feat):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                feat, var, s, train=True, mutable=["batch_stats"])
            return jnp.sum(out * out)

        gr = jax.grad(lambda p: loss(ref, p, feat))(v["params"])
        gf = jax.grad(lambda p: loss(fus, p, feat))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(gr),
                        jax.tree_util.tree_leaves(gf)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)
        gx_r = jax.grad(lambda f: loss(ref, v["params"], f))(feat)
        gx_f = jax.grad(lambda f: loss(fus, v["params"], f))(feat)
        scale = max(1.0, float(np.abs(np.asarray(gx_r)).max()))
        np.testing.assert_allclose(np.asarray(gx_r) / scale,
                                   np.asarray(gx_f) / scale, atol=2e-3)
