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


class TestEdgeConvDecomposition:
    """The decomposed EdgeConv path (VNLinearLeakyReLU(edge_idx=...)) must
    match the reference composition (vn_graph_feature_planes -> layer ->
    K-mean) in outputs, gradients, BN running stats, and parameter tree."""

    @pytest.fixture
    def setup(self, rng):
        from vn_pointcloudcompletion_tpu.models.dgcnn import (
            _edge_idx_planes,
            _edge_vn_planes,
            _pool_edge_planes,
        )

        b, c, n, k = 2, 8, 32, 4
        x = jnp.asarray(rng.standard_normal((b, 3, c, n)).astype(np.float32))
        idx = _edge_idx_planes(x, k)
        mod = VNLinearLeakyReLU(16, layout="plane")

        def legacy(variables, x, train=False, **kw):
            f = _edge_vn_planes(x, k)
            out = mod.apply(variables, f, train=train, **kw)
            if train:
                out, updated = out
                return _pool_edge_planes(out, n, k), updated
            return _pool_edge_planes(out, n, k)

        def edge(variables, x, train=False, **kw):
            return mod.apply(variables, x, train=train, edge_idx=idx, **kw)

        return mod, x, idx, legacy, edge

    def test_param_tree_identical(self, setup):
        mod, x, idx, _, _ = setup
        from vn_pointcloudcompletion_tpu.models.dgcnn import _edge_vn_planes

        v_edge = mod.init(jax.random.key(0), x, edge_idx=idx)
        v_leg = mod.init(jax.random.key(0), _edge_vn_planes(x, idx.shape[2]))
        leg_shapes = jax.tree.map(jnp.shape, v_leg)
        edge_shapes = jax.tree.map(jnp.shape, v_edge)
        assert leg_shapes == edge_shapes

    def test_forward_eval(self, setup):
        mod, x, idx, legacy, edge = setup
        variables = mod.init(jax.random.key(0), x, edge_idx=idx)
        np.testing.assert_allclose(
            edge(variables, x), legacy(variables, x), atol=ATOL
        )

    def test_forward_train_and_stats(self, setup):
        mod, x, idx, legacy, edge = setup
        variables = mod.init(jax.random.key(0), x, edge_idx=idx)
        out_e, up_e = mod.apply(
            variables, x, train=True, edge_idx=idx, mutable=["batch_stats"]
        )
        out_l, up_l = legacy(variables, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(out_e, out_l, atol=ATOL)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, atol=ATOL),
            up_e, up_l,
        )

    def test_gradients_match(self, setup):
        mod, x, idx, legacy, edge = setup
        variables = mod.init(jax.random.key(0), x, edge_idx=idx)

        def loss_e(params, x):
            out, _ = mod.apply(
                {**variables, "params": params}, x, train=True,
                edge_idx=idx, mutable=["batch_stats"],
            )
            return jnp.sum(out * out)

        def loss_l(params, x):
            out, _ = legacy(
                {**variables, "params": params}, x, train=True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out * out)

        ge = jax.grad(loss_e, argnums=(0, 1))(variables["params"], x)
        gl = jax.grad(loss_l, argnums=(0, 1))(variables["params"], x)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, atol=5e-4),
            ge, gl,
        )

    def test_edge_kernel_matches_decomposed(self, rng, monkeypatch):
        """The whole-stage Pallas program (edge_k= mode, interpret on CPU)
        must match the knn + edge_idx decomposition in outputs, stats, and
        gradients."""
        monkeypatch.setenv("VN_EDGE_KERNEL", "1")
        from vn_pointcloudcompletion_tpu.models.dgcnn import _edge_idx_planes

        b, c, n, k = 2, 8, 32, 16
        x = jnp.asarray(rng.standard_normal((b, 3, c, n)).astype(np.float32))
        idx = _edge_idx_planes(x, k)
        mod = VNLinearLeakyReLU(12, layout="plane")
        variables = mod.init(jax.random.key(0), x, edge_idx=idx)

        out_k, up_k = mod.apply(
            variables, x, train=True, edge_k=k, mutable=["batch_stats"]
        )
        out_i, up_i = mod.apply(
            variables, x, train=True, edge_idx=idx, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(out_k, out_i, atol=1e-5)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, atol=1e-5),
            up_k, up_i,
        )

        def loss(params, x, use_kernel):
            kw = {"edge_k": k} if use_kernel else {"edge_idx": idx}
            out, _ = mod.apply(
                {**variables, "params": params}, x, train=True,
                mutable=["batch_stats"], **kw,
            )
            return jnp.sum(out * out)

        gk = jax.grad(loss, argnums=(0, 1))(variables["params"], x, True)
        gi = jax.grad(loss, argnums=(0, 1))(variables["params"], x, False)
        jax.tree.map(
            lambda a, b_: np.testing.assert_allclose(a, b_, atol=5e-4),
            gk, gi,
        )

    def test_edge_bwd_chunked_onehot_matches_scatter(self, rng, monkeypatch):
        """_ekg_bwd's k-chunked one-hot contraction (engaged when
        b*k*n*n exceeds _BWD_ONEHOT_MAX, e.g. the n=2048 eligibility
        corner) must equal the direct scatter-add semantics."""
        from vn_pointcloudcompletion_tpu.ops import knn_pallas

        b, c3, n, k = 2, 5, 32, 16
        idx = jnp.asarray(rng.integers(0, n, (b, n, k)).astype(np.int32))
        ct = jnp.asarray(
            rng.standard_normal((b, c3, k, n)).astype(np.float32)
        ).reshape(b, c3, k * n)
        res = (idx, jnp.zeros((7, 0), jnp.float32),
               jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.float32))

        du_ref = np.zeros((b, c3, n), np.float32)
        ct_kn = np.asarray(ct).reshape(b, c3, k, n)
        for bi in range(b):
            for kk in range(k):
                for q in range(n):
                    du_ref[bi, :, idx[bi, q, kk]] += ct_kn[bi, :, kk, q]

        _, du_single, _ = knn_pallas._ekg_bwd(k, True, res, ct)
        monkeypatch.setattr(knn_pallas, "_BWD_ONEHOT_MAX", b * 3 * n * n)
        _, du_chunk, _ = knn_pallas._ekg_bwd(k, True, res, ct)
        np.testing.assert_allclose(du_single, du_ref, atol=1e-5)
        np.testing.assert_allclose(du_chunk, du_ref, atol=1e-5)

    def test_onehot_gather_matches_take(self, rng):
        from vn_pointcloudcompletion_tpu.ops.knn import gather_planes

        x = jnp.asarray(rng.standard_normal((2, 3, 8, 32)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 32, (2, 32, 4)).astype(np.int32))
        np.testing.assert_allclose(
            gather_planes(x, idx, mode="onehot"),
            gather_planes(x, idx, mode="take"),
            atol=1e-6,
        )

    def test_grouper_gated_paths_agree(self, rng, monkeypatch):
        from vn_pointcloudcompletion_tpu.models.pointr import VNDGCNNGrouper

        xyz = jnp.asarray(
            rng.standard_normal((2, 2048, 3)).astype(np.float32)
        )
        monkeypatch.setenv("VN_EDGE_FUSED", "1")
        mod = VNDGCNNGrouper()
        v = mod.init(jax.random.key(0), xyz)
        coor_f, f_f = mod.apply(v, xyz)
        monkeypatch.setenv("VN_EDGE_FUSED", "0")
        coor_r, f_r = mod.apply(v, xyz)
        np.testing.assert_allclose(coor_f, coor_r, atol=ATOL)
        np.testing.assert_allclose(f_f, f_r, atol=1e-4)


class TestZeroVectorGradients:
    """Exact-zero vector channels must have finite (zero) norm gradients.

    The reference's torch ``norm`` defines the 2-norm subgradient at 0 as 0;
    ``jnp.linalg.norm``'s VJP is x/|x| = 0/0 = NaN.  Exact zeros occur
    in-graph on real data: the PCN loader resample-pads by duplicating
    points, so edge features (x_j - x_i) of duplicate pairs cancel exactly,
    and one zero vector NaNs the whole step's gradients (observed as a
    chronic ~25-40% skipped-step rate on the vn_dgcnn_fps 8-category run,
    reference models/vn_layers.py:38-43 semantics).  ``safe_norm`` pins the
    torch convention.
    """

    def test_safe_norm_value_and_zero_grad(self, rng):
        from vn_pointcloudcompletion_tpu.nn.vn import safe_norm

        x = jnp.asarray(rng.standard_normal((4, 3, 5)).astype(np.float32))
        np.testing.assert_allclose(
            safe_norm(x, axis=1), jnp.linalg.norm(x, axis=1), rtol=1e-6
        )
        # gradient at an exactly-zero vector is 0, not NaN (torch convention)
        g = jax.grad(lambda v: jnp.sum(safe_norm(v, axis=0)))(jnp.zeros((3, 2)))
        np.testing.assert_array_equal(g, jnp.zeros((3, 2)))
        # and matches x/|x| away from zero
        gx = jax.grad(lambda v: jnp.sum(safe_norm(v, axis=1)))(x)
        np.testing.assert_allclose(
            gx, x / jnp.linalg.norm(x, axis=1, keepdims=True), rtol=1e-5
        )

    def test_reference_epilogue_zero_vector_grad_finite(self, rng):
        from vn_pointcloudcompletion_tpu.ops import vn_fused

        b, c, n = 2, 8, 16
        p = rng.standard_normal((b, 3, c, n)).astype(np.float32)
        d = rng.standard_normal((b, 3, c, n)).astype(np.float32)
        p[:, :, 2, :] = 0.0  # a whole zero channel (duplicate-pair edges)
        p[0, :, 0, 3] = 0.0  # and one isolated zero vector
        a = rng.standard_normal(c).astype(np.float32)
        bb = rng.standard_normal(c).astype(np.float32)

        def loss(p, d, a, bb):
            return jnp.sum(
                vn_fused.reference_bn_leaky_planes(
                    jnp.asarray(p), jnp.asarray(d), jnp.asarray(a),
                    jnp.asarray(bb), 0.2
                )
            )

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(p, d, a, bb)
        for g in grads:
            assert bool(jnp.all(jnp.isfinite(g))), "non-finite gradient"

    def test_vn_linear_leaky_relu_zero_input_vector_grad_finite(self, rng):
        x = rng.standard_normal((2, 3, 4, 16)).astype(np.float32)
        x[:, :, :, 5] = 0.0  # a zero POINT: all channels zero at one point
        x = jnp.asarray(x)
        # fused=False pins the reference (pure-XLA) path — the one whose
        # autodiff hits jnp.linalg.norm
        mod = VNLinearLeakyReLU(8, layout="plane", fused=False)
        variables = mod.init(jax.random.key(0), x, train=True)

        def loss(params):
            out, _ = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)

    def test_vn_batchnorm_zero_vector_grad_finite(self, rng):
        x = rng.standard_normal((2, 4, 3, 16)).astype(np.float32)
        x[1, 2, :, :] = 0.0
        x = jnp.asarray(x)
        mod = VNBatchNorm(4)
        variables = mod.init(jax.random.key(0), x, train=True)

        def loss(xin):
            out, _ = mod.apply(variables, xin, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(out)

        g = jax.grad(loss)(x)
        assert bool(jnp.all(jnp.isfinite(g)))
