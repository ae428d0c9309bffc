"""SO(3) equivariance property tests for every VN layer.

The defining property the reference depends on but never tests
(SURVEY.md §4): for each layer f, f(R x) == R f(x) under random rotations,
where R acts on the 3-vector axis (axis 2).  VNStdFeature's first output must
instead be *invariant*.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.nn import (
    VNLinear,
    VNLeakyReLU,
    VNLinearLeakyReLU,
    VNLinearAndLeakyReLU,
    VNBatchNorm,
    VNLayerNorm,
    VNMaxPool,
    VNStdFeature,
    mean_pool,
    VNAttention,
    VNBlock,
)

ATOL = 2e-5


def rotate(x, r):
    """Rotate the vector axis (axis 2) of (B, C, 3, ...): v' = v @ R."""
    return jnp.einsum("bcd...,de->bce...", x, r)


def rand_rot(seed=0):
    from vn_pointcloudcompletion_tpu.ops import random_rotations

    return random_rotations(jax.random.key(seed), 1)[0]


def make_x(rng, shape=(2, 8, 3, 16)):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def check_equivariant(module, x, r, train_kwarg=True, **apply_kw):
    key = jax.random.key(0)
    if train_kwarg:
        variables = module.init(key, x, train=False)
        out_rot_in = module.apply(variables, rotate(x, r), train=False, **apply_kw)
        out = module.apply(variables, x, train=False, **apply_kw)
    else:
        variables = module.init(key, x)
        out_rot_in = module.apply(variables, rotate(x, r), **apply_kw)
        out = module.apply(variables, x, **apply_kw)
    np.testing.assert_allclose(out_rot_in, rotate(out, r), atol=ATOL)


class TestEquivariance:
    def test_vn_linear(self, rng):
        check_equivariant(VNLinear(12), make_x(rng), rand_rot(), train_kwarg=False)

    def test_vn_leaky_relu(self, rng):
        check_equivariant(VNLeakyReLU(), make_x(rng), rand_rot(), train_kwarg=False)

    def test_vn_leaky_relu_shared(self, rng):
        check_equivariant(
            VNLeakyReLU(share_nonlinearity=True), make_x(rng), rand_rot(),
            train_kwarg=False,
        )

    def test_vn_batchnorm(self, rng):
        check_equivariant(VNBatchNorm(), make_x(rng), rand_rot())

    def test_vn_layernorm(self, rng):
        check_equivariant(VNLayerNorm(), make_x(rng), rand_rot(), train_kwarg=False)

    def test_vn_linear_leaky_relu(self, rng):
        check_equivariant(VNLinearLeakyReLU(12), make_x(rng), rand_rot())

    def test_vn_linear_and_leaky_relu(self, rng):
        check_equivariant(VNLinearAndLeakyReLU(12), make_x(rng), rand_rot())
        check_equivariant(
            VNLinearAndLeakyReLU(12, use_batchnorm="none"), make_x(rng), rand_rot()
        )

    def test_vn_maxpool(self, rng):
        check_equivariant(VNMaxPool(), make_x(rng), rand_rot(), train_kwarg=False)

    def test_vn_maxpool_5d(self, rng):
        x = make_x(rng, (2, 8, 3, 10, 4))
        check_equivariant(VNMaxPool(), x, rand_rot(), train_kwarg=False)

    def test_vn_attention(self, rng):
        x = make_x(rng, (2, 8, 3, 16))
        check_equivariant(
            VNAttention(attn_channels=8, out_channels=8, num_heads=2),
            x, rand_rot(), train_kwarg=False,
        )

    def test_vn_block(self, rng):
        x = make_x(rng, (2, 8, 3, 16))
        check_equivariant(
            VNBlock(channels=8, attn_channels=8, num_heads=2), x, rand_rot()
        )

    def test_vn_std_feature_invariance(self, rng):
        x = make_x(rng)
        r = rand_rot()
        mod = VNStdFeature()
        variables = mod.init(jax.random.key(0), x, train=False)
        std, _ = mod.apply(variables, x, train=False)
        std_rot, _ = mod.apply(variables, rotate(x, r), train=False)
        np.testing.assert_allclose(std, std_rot, atol=1e-4)


class TestSemantics:
    def test_vn_linear_is_channel_matmul(self, rng):
        x = make_x(rng)
        mod = VNLinear(5)
        variables = mod.init(jax.random.key(0), x)
        out = mod.apply(variables, x)
        w = variables["params"]["kernel"]
        ref = np.einsum("oc,bcdn->bodn", np.asarray(w), np.asarray(x))
        np.testing.assert_allclose(out, ref, atol=1e-6)
        assert out.shape == (2, 5, 3, 16)

    def test_vn_leaky_positive_halfspace_identity(self, rng):
        # When <x, d> >= 0 everywhere, output == x regardless of slope.
        x = make_x(rng)
        mod = VNLeakyReLU(negative_slope=0.2)
        variables = mod.init(jax.random.key(0), x)
        # force d == x by overwriting the direction map with identity
        variables = {"params": {"dir_kernel": jnp.eye(x.shape[1])}}
        out = mod.apply(variables, x)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_vn_maxpool_selects_existing_vectors(self, rng):
        x = make_x(rng)
        mod = VNMaxPool()
        variables = mod.init(jax.random.key(0), x)
        out = np.asarray(mod.apply(variables, x))
        xs = np.asarray(x)
        for b in range(xs.shape[0]):
            for c in range(xs.shape[1]):
                assert any(
                    np.allclose(out[b, c], xs[b, c, :, n])
                    for n in range(xs.shape[3])
                )

    def test_batchnorm_updates_running_stats(self, rng):
        x = make_x(rng)
        mod = VNBatchNorm()
        variables = mod.init(jax.random.key(0), x, train=False)
        _, updated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        before = variables["batch_stats"]["BatchNorm_0"]["mean"]
        after = updated["batch_stats"]["BatchNorm_0"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_mean_pool(self, rng):
        x = make_x(rng)
        np.testing.assert_allclose(
            mean_pool(x), np.asarray(x).mean(axis=-1), atol=1e-6
        )
