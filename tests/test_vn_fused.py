"""Fused plane-layout BN+leaky kernel: forward/gradient parity and the
plane-layout module path vs the reference vec-layout path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.ops.vn_fused import (
    eligible,
    fused_bn_leaky,
    reference_bn_leaky_planes,
)


def make_inputs(rng, b=2, c=128, n=600):
    p = jnp.asarray(rng.standard_normal((b, 3, c, n)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((b, 3, c, n)).astype(np.float32))
    a = jnp.asarray((1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32))
    bb = jnp.asarray((0.1 * rng.standard_normal(c)).astype(np.float32))
    return p, d, a, bb


class TestFusedForward:
    @pytest.mark.parametrize("n", [512, 600, 1024])
    def test_matches_reference(self, rng, n):
        p, d, a, b = make_inputs(rng, n=n)
        out = fused_bn_leaky(p, d, a, b, 0.2, True)
        ref = reference_bn_leaky_planes(p, d, a, b, 0.2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_eligibility(self, rng):
        p, *_ = make_inputs(rng, c=128, n=512)
        assert eligible(p)
        assert not eligible(p[:, :, :, :100])  # N < TN
        assert eligible(jnp.zeros((2, 3, 96, 512)))  # thin layer, sublane ok
        assert not eligible(jnp.zeros((2, 3, 10, 512)))  # C not 16-aligned
        assert not eligible(jnp.zeros((2, 96, 3, 512)))  # vec layout


class TestFusedGradients:
    def test_grads_match_autodiff(self, rng):
        p, d, a, b = make_inputs(rng, n=600)
        g_out = jnp.asarray(
            rng.standard_normal((2, 3, 128, 600)).astype(np.float32)
        )

        def loss_fused(p, d, a, b):
            return jnp.sum(fused_bn_leaky(p, d, a, b, 0.2, True) * g_out)

        def loss_ref(p, d, a, b):
            return jnp.sum(reference_bn_leaky_planes(p, d, a, b, 0.2) * g_out)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p, d, a, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, d, a, b)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gf[3]), np.asarray(gr[3]),
                                   rtol=2e-4, atol=2e-3)

    def test_grads_bf16_storage(self, rng):
        p, d, a, b = make_inputs(rng, n=512)
        p16, d16 = p.astype(jnp.bfloat16), d.astype(jnp.bfloat16)
        g = jax.grad(
            lambda x: jnp.sum(
                fused_bn_leaky(x, d16, a, b, 0.2, True).astype(jnp.float32) ** 2
            )
        )(p16)
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()


class TestPlaneModulePath:
    """Plane-layout VNLinearLeakyReLU must equal the reference vec layout,
    sharing one parameter tree, in train and eval."""

    def _mods(self):
        from vn_pointcloudcompletion_tpu.nn.vn import VNLinearLeakyReLU

        return (
            VNLinearLeakyReLU(128, layout="plane"),
            VNLinearLeakyReLU(128, layout="vec"),
        )

    def test_same_tree_and_eval_output(self, rng):
        plane, vec = self._mods()
        xv = jnp.asarray(rng.standard_normal((2, 8, 3, 520)).astype(np.float32))
        xp = jnp.swapaxes(xv, 1, 2)
        vf = plane.init(jax.random.key(0), xp, train=False)
        vp = vec.init(jax.random.key(0), xv, train=False)
        assert jax.tree.structure(vf) == jax.tree.structure(vp)
        of = jnp.swapaxes(plane.apply(vf, xp, train=False), 1, 2)
        op = vec.apply(vp, xv, train=False)
        np.testing.assert_allclose(np.asarray(of), np.asarray(op), atol=1e-5)

    def test_train_mode_outputs_and_stats(self, rng):
        plane, vec = self._mods()
        xv = jnp.asarray(rng.standard_normal((2, 8, 3, 520)).astype(np.float32))
        xp = jnp.swapaxes(xv, 1, 2)
        v = vec.init(jax.random.key(0), xv, train=False)
        of, mf = plane.apply(v, xp, train=True, mutable=["batch_stats"])
        op, mp = vec.apply(v, xv, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(of, 1, 2)), np.asarray(op), atol=1e-5
        )
        for a, b in zip(jax.tree.leaves(mf), jax.tree.leaves(mp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_train_gradients_match(self, rng):
        plane, vec = self._mods()
        xv = jnp.asarray(rng.standard_normal((2, 8, 3, 520)).astype(np.float32))
        xp = jnp.swapaxes(xv, 1, 2)
        v = vec.init(jax.random.key(0), xv, train=False)

        def loss(mod, x, params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(out))

        gf = jax.grad(lambda p: loss(plane, xp, p))(v["params"])
        gp = jax.grad(lambda p: loss(vec, xv, p))(v["params"])
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-4)

    def test_maxpool_plane_equals_vec(self, rng):
        from vn_pointcloudcompletion_tpu.nn.vn import VNMaxPool

        xv = jnp.asarray(rng.standard_normal((2, 8, 3, 64)).astype(np.float32))
        xp = jnp.swapaxes(xv, 1, 2)
        vecm, planem = VNMaxPool(layout="vec"), VNMaxPool(layout="plane")
        v = vecm.init(jax.random.key(0), xv)
        ov = vecm.apply(v, xv)  # (B, C, 3)
        op = planem.apply(v, xp)  # (B, 3, C)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(op, 1, 2)), np.asarray(ov), atol=1e-6
        )
