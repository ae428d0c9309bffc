"""Fused BN+leaky kernel: forward and gradient parity vs jnp autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.ops.vn_fused import (
    eligible,
    fused_bn_leaky,
    reference_bn_leaky,
)


def make_inputs(rng, b=2, c=128, n=600):
    pd = rng.standard_normal((b, 2 * c, 3, n)).astype(np.float32)
    a = (1.0 + 0.1 * rng.standard_normal(c)).astype(np.float32)
    bb = (0.1 * rng.standard_normal(c)).astype(np.float32)
    return jnp.asarray(pd), jnp.asarray(a), jnp.asarray(bb)


class TestFusedForward:
    @pytest.mark.parametrize("n", [512, 600, 1024])
    def test_matches_reference(self, rng, n):
        pd, a, b = make_inputs(rng, n=n)
        out = fused_bn_leaky(pd, a, b, 0.2, True)
        ref = reference_bn_leaky(pd, a, b, 0.2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_eligibility(self, rng):
        pd, a, b = make_inputs(rng, c=128, n=512)
        assert eligible(pd)
        assert not eligible(pd[:, :, :, :100])  # N < TN
        assert not eligible(jnp.zeros((2, 2 * 96, 3, 512)))  # C not /128
        assert not eligible(jnp.zeros((2, 256, 3, 512, 4)))  # 5-D


class TestFusedModulePath:
    """The fused VNLinearLeakyReLU path must equal the unfused one bit-for-
    tolerance, sharing one parameter tree, in both train and eval modes."""

    def _mods(self):
        from vn_pointcloudcompletion_tpu.nn.vn import VNLinearLeakyReLU

        return (
            VNLinearLeakyReLU(128, fused=True),
            VNLinearLeakyReLU(128, fused=False),
        )

    def test_same_tree_and_eval_output(self, rng):
        fused, plain = self._mods()
        x = jnp.asarray(rng.standard_normal((2, 8, 3, 520)).astype(np.float32))
        vf = fused.init(jax.random.key(0), x, train=False)
        vp = plain.init(jax.random.key(0), x, train=False)
        assert jax.tree.structure(vf) == jax.tree.structure(vp)
        of = fused.apply(vf, x, train=False)
        op = plain.apply(vp, x, train=False)
        np.testing.assert_allclose(np.asarray(of), np.asarray(op), atol=1e-5)

    def test_train_mode_outputs_and_stats(self, rng):
        fused, plain = self._mods()
        x = jnp.asarray(rng.standard_normal((2, 8, 3, 520)).astype(np.float32))
        v = fused.init(jax.random.key(0), x, train=False)
        of, mf = fused.apply(v, x, train=True, mutable=["batch_stats"])
        op, mp = plain.apply(v, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(of), np.asarray(op), atol=1e-5)
        for a, b in zip(jax.tree.leaves(mf), jax.tree.leaves(mp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_train_gradients_match(self, rng):
        fused, plain = self._mods()
        x = jnp.asarray(rng.standard_normal((2, 8, 3, 520)).astype(np.float32))
        v = fused.init(jax.random.key(0), x, train=False)

        def loss(mod, params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(out))

        gf = jax.grad(lambda p: loss(fused, p))(v["params"])
        gp = jax.grad(lambda p: loss(plain, p))(v["params"])
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-4)


class TestFusedGradients:
    def test_grads_match_autodiff(self, rng):
        pd, a, b = make_inputs(rng, n=600)
        g_out = jnp.asarray(
            rng.standard_normal((2, 128, 3, 600)).astype(np.float32)
        )

        def loss_fused(pd, a, b):
            return jnp.sum(fused_bn_leaky(pd, a, b, 0.2, True) * g_out)

        def loss_ref(pd, a, b):
            return jnp.sum(reference_bn_leaky(pd, a, b, 0.2) * g_out)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(pd, a, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(pd, a, b)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(gr[2]),
                                   rtol=2e-4, atol=2e-3)

    def test_grads_bf16_storage(self, rng):
        pd, a, b = make_inputs(rng, n=512)
        pd16 = pd.astype(jnp.bfloat16)
        g = jax.grad(
            lambda x: jnp.sum(
                fused_bn_leaky(x, a, b, 0.2, True).astype(jnp.float32) ** 2
            )
        )(pd16)
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()
