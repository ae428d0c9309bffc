"""The split first-fold layer must equal the naive concat formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.models.pcn import (
    _ScalarSplitFoldLayer,
    _VNSplitFoldLayer,
)
from vn_pointcloudcompletion_tpu.nn.vn import VNLinearLeakyReLU


class TestVNSplitFold:
    def test_matches_fused_concat_layer(self, rng):
        b, cg, nd, out = 2, 16, 32, 8
        glob = jnp.asarray(rng.standard_normal((b, cg, 3, 1)).astype(np.float32))
        seed = jnp.asarray(rng.standard_normal((b, 1, 3, nd)).astype(np.float32))
        point = jnp.asarray(rng.standard_normal((b, 1, 3, nd)).astype(np.float32))

        # the split layer runs in plane layout (B, 3, C, N)
        glob_p = jnp.swapaxes(glob, 1, 2)
        seed_p = jnp.swapaxes(seed, 1, 2)
        point_p = jnp.swapaxes(point, 1, 2)
        split = _VNSplitFoldLayer(out)
        vs = split.init(jax.random.key(0), glob_p, seed_p, point_p, train=False)
        out_split = jnp.swapaxes(
            split.apply(vs, glob_p, seed_p, point_p, train=False), 1, 2
        )

        # assemble the equivalent fused kernel and run VNLinearLeakyReLU
        p = vs["params"]
        w = jnp.concatenate(
            [p["kernel_global"], p["kernel_seed"], p["kernel_point"]], axis=1
        )
        d = jnp.concatenate(
            [p["dir_kernel_global"], p["dir_kernel_seed"], p["dir_kernel_point"]],
            axis=1,
        )
        fused = VNLinearLeakyReLU(out)
        glob_b = jnp.broadcast_to(glob, (b, cg, 3, nd))
        feat = jnp.concatenate([glob_b, seed, point], axis=1)
        vf = fused.init(jax.random.key(1), feat, train=False)
        vf = jax.tree.map(lambda x: x, vf)
        vf["params"]["kernel"] = w
        vf["params"]["dir_kernel"] = d
        out_fused = fused.apply(vf, feat, train=False)
        np.testing.assert_allclose(out_split, out_fused, atol=1e-5)

    def test_pair_fold_matches_fused_concat(self, rng):
        from vn_pointcloudcompletion_tpu.models.pcn import _VNSplitPairFoldLayer

        b, cf, n, s, out = 2, 16, 8, 4, 8
        feat = jnp.asarray(rng.standard_normal((b, 3, cf, n)).astype(np.float32))
        var = jnp.asarray(
            rng.standard_normal((b, 3, 1, n * s)).astype(np.float32)
        )
        mod = _VNSplitPairFoldLayer(out)
        vs = mod.init(jax.random.key(0), feat, var, s, train=False)
        got = mod.apply(vs, feat, var, s, train=False)  # (B, 3, out, NS)

        # assemble the equivalent fused layer on concat([var, feat_expanded])
        p = vs["params"]
        w = jnp.concatenate([p["kernel_var"], p["kernel_feat"]], axis=1)
        d = jnp.concatenate([p["dir_kernel_var"], p["dir_kernel_feat"]], axis=1)
        feat_e = jnp.broadcast_to(
            feat[..., None], (b, 3, cf, n, s)
        ).reshape(b, 3, cf, n * s)
        x_vec = jnp.swapaxes(jnp.concatenate([var, feat_e], axis=2), 1, 2)
        fused = VNLinearLeakyReLU(out)
        vf = fused.init(jax.random.key(1), x_vec, train=False)
        vf["params"]["kernel"] = w
        vf["params"]["dir_kernel"] = d
        want = fused.apply(vf, x_vec, train=False)  # vec (B, out, 3, NS)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5
        )

    def test_scalar_matches_fused(self, rng):
        b, cg, nd, out = 2, 12, 32, 6
        glob = jnp.asarray(rng.standard_normal((b, cg)).astype(np.float32))
        seed = jnp.asarray(rng.standard_normal((b, 2, nd)).astype(np.float32))
        point = jnp.asarray(rng.standard_normal((b, 3, nd)).astype(np.float32))

        split = _ScalarSplitFoldLayer(out)
        vs = split.init(jax.random.key(0), glob, seed, point)
        got = split.apply(vs, glob, seed, point)

        p = vs["params"]
        w = np.concatenate(
            [p["kernel_global"], p["kernel_seed"], p["kernel_point"]], axis=1
        )
        feat = np.concatenate(
            [np.broadcast_to(np.asarray(glob)[:, :, None], (b, cg, nd)),
             np.asarray(seed), np.asarray(point)], axis=1
        )
        want = np.einsum("oc,bcn->bon", w, feat) + np.asarray(p["bias"])[None, :, None]
        np.testing.assert_allclose(got, want, atol=1e-5)
