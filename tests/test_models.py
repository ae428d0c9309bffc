"""Model zoo tests: forward shapes for every encoder/decoder combo and
SO(3) equivariance of the full VN pipeline (the property the reference is
built around).

Uses tiny point counts where the architecture allows it to keep CPU tests
fast; the FPS stages pin some sizes (2048 -> 512 -> 128 needs N >= 512), so
dgcnn-family tests run at reduced-but-valid sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.models import (
    PCN,
    PCNNet,
    VNPointNet,
    VNFoldingNet,
    FoldingNet,
    AttentionVNFoldingNet,
    DGCNNfps,
    VNDGCNNfps,
    DGCNN,
    VNPCTransformer,
)
from vn_pointcloudcompletion_tpu.ops import random_rotations, rotate_points


def init_and_run(model, *args, seed=0, **kwargs):
    variables = model.init(jax.random.key(seed), *args, train=False, **kwargs)
    out = model.apply(variables, *args, train=False, **kwargs)
    return variables, out


class TestPCN:
    def test_full_model_shapes(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))
        model = PCN(num_dense=256, latent_dim=64, grid_size=4)
        _, (coarse, fine) = init_and_run(model, xyz)
        assert coarse.shape == (2, 16, 3)
        assert fine.shape == (2, 256, 3)

    def test_only_coarse(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32))
        model = PCN(num_dense=256, latent_dim=64, grid_size=4, only_coarse=True)
        _, (coarse, fine) = init_and_run(model, xyz)
        assert coarse.shape == (2, 16, 3) and fine is None


class TestVNPointNet:
    def test_shapes_1024(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        model = VNPointNet(num_coarse=1024, latent_dim=8)
        _, (coarse, fg) = init_and_run(model, xyz)
        assert coarse.shape == (2, 1024, 3)
        assert fg.shape == (2, 16, 3, 1)

    def test_shapes_448_returns_pair(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
        model = VNPointNet(num_coarse=448, latent_dim=8)
        _, ((c224, c448), fg) = init_and_run(model, xyz)
        assert c224.shape == (2, 224, 3) and c448.shape == (2, 448, 3)

    def test_encoder_equivariance(self, rng):
        xyz = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
        model = VNPointNet(num_coarse=32, latent_dim=8)
        variables = model.init(jax.random.key(0), xyz, train=False)
        r = random_rotations(jax.random.key(5), 2)
        c1, _ = model.apply(variables, rotate_points(xyz, r), train=False)
        c0, _ = model.apply(variables, xyz, train=False)
        np.testing.assert_allclose(c1, rotate_points(c0, r), atol=2e-4)


class TestDecoders:
    def _coarse_fg(self, rng, latent=16):
        coarse = jnp.asarray(rng.standard_normal((2, 1024, 3)).astype(np.float32))
        fg = jnp.asarray(rng.standard_normal((2, latent, 3, 1)).astype(np.float32))
        return coarse, fg

    def test_vn_foldingnet_shapes(self, rng):
        coarse, fg = self._coarse_fg(rng)
        model = VNFoldingNet(num_coarse=1024, latent_dim=16)
        _, fine = init_and_run(model, coarse, fg)
        assert fine.shape == (2, 16384, 3)

    def test_vn_foldingnet_seed_rotation(self, rng):
        coarse, fg = self._coarse_fg(rng)
        model = VNFoldingNet(num_coarse=1024, latent_dim=16)
        variables = model.init(jax.random.key(0), coarse, fg, train=False)
        r = random_rotations(jax.random.key(1), 2)
        # full pipeline equivariance: rotate coarse + fg + seed -> rotated fine
        fine0 = model.apply(variables, coarse, fg, None, train=False)
        fg_rot = jnp.einsum("bcdn,bde->bcen", fg, r)
        fine1 = model.apply(
            variables, rotate_points(coarse, r), fg_rot, r, train=False
        )
        np.testing.assert_allclose(fine1, rotate_points(fine0, r), atol=2e-4)

    def test_foldingnet_shapes(self, rng):
        coarse = jnp.asarray(rng.standard_normal((2, 1024, 3)).astype(np.float32))
        fg = jnp.asarray(rng.standard_normal((2, 2048, 3, 1)).astype(np.float32))
        model = FoldingNet(num_coarse=1024)
        _, fine = init_and_run(model, coarse, fg)
        assert fine.shape == (2, 16384, 3)

    def test_attention_vn_foldingnet_shapes(self, rng):
        coarse = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32))
        fg = jnp.asarray(rng.standard_normal((1, 2048, 3, 1)).astype(np.float32))
        model = AttentionVNFoldingNet(num_coarse=64, latent_dim=2048)
        _, fine = init_and_run(model, coarse, fg)
        assert fine.shape == (1, 64 * 16, 3)

    def test_448_dense_counts(self, rng):
        coarse = jnp.asarray(rng.standard_normal((1, 224, 3)).astype(np.float32))
        fg = jnp.asarray(rng.standard_normal((1, 16, 3, 1)).astype(np.float32))
        model = VNFoldingNet(num_coarse=448, latent_dim=16)
        _, fine = init_and_run(model, coarse, fg)
        assert fine.shape == (1, 14336, 3)


class TestDGCNN:
    def test_dgcnn_fps_shapes(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = DGCNNfps(num_coarse=64)
        _, (coarse, fg) = init_and_run(model, xyz)
        assert coarse.shape == (1, 64, 3)
        assert fg.shape == (1, 1024)

    @pytest.mark.slow
    def test_vn_dgcnn_fps_shapes_and_equivariance(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = VNDGCNNfps(num_coarse=32)
        variables, (coarse, fg) = init_and_run(model, xyz)
        assert coarse.shape == (1, 32, 3)
        assert fg.shape == (1, 512, 3, 1)
        r = random_rotations(jax.random.key(3), 1)
        c1, _ = model.apply(variables, rotate_points(xyz, r), train=False)
        np.testing.assert_allclose(c1, rotate_points(coarse, r), atol=3e-4)

    def test_classic_dgcnn_coarse(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32))
        model = DGCNN(num_coarse=16, n_knn=8)
        _, (coarse, fg) = init_and_run(model, xyz)
        assert coarse.shape == (1, 16, 3)


class TestVNPCTransformer:
    @pytest.mark.slow
    def test_coarse_only_shapes(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = VNPCTransformer(enc_depth=2, num_query=64)
        _, ((c, c_cat), fg) = init_and_run(model, xyz)
        assert c.shape == (1, 64, 3)
        assert c_cat.shape == (1, 128, 3)
        assert fg.shape == (1, 1024, 3, 1)

    def test_with_decoder_path(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = VNPCTransformer(enc_depth=1, dec_depth=1, num_query=32,
                                only_coarse=False)
        _, ((c, c_cat), (fg, q)) = init_and_run(model, xyz)
        assert c.shape == (1, 32, 3) and c_cat.shape == (1, 64, 3)
        assert q.shape == (1, 32, 384)  # refined per-query decoder features

    def test_scalar_variant(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = VNPCTransformer(enc_depth=1, num_query=32, dgcnn="dgcnn",
                                trans="trans")
        _, ((c, c_cat), fg) = init_and_run(model, xyz)
        assert c.shape == (1, 32, 3) and fg.shape == (1, 1024)

    @pytest.mark.slow
    def test_pointr_decoder_through_composer(self, rng):
        """pointr_decoder=True wires the 8-block decoder stack end-to-end
        (VERDICT r2 #10): fine output produced, and gradients reach the
        decoder stack AND the fold's query projection — the stack is live
        product surface, not dead compute."""
        import jax

        from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1

        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = PCNNet(
            enc_type="vn_pointr", dec_type="attention_vn_foldingnet",
            num_coarse=448, latent_dim=2048, pointr_decoder=True,
        )
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=False)
        )(jax.random.key(0), xyz)
        coarse, fine = model.apply(variables, xyz, train=False)
        assert coarse.shape == (1, 448, 3)
        # fold runs around the 224 predicted centres (grid 8 -> 64 each)
        assert fine.shape == (1, 224 * 64, 3)
        enc_params = variables["params"]["encoder"]
        assert "decoder_0" in enc_params and "decoder_scan" in enc_params
        assert "query_proj" in variables["params"]["decoder"]

        gt = jnp.asarray(rng.standard_normal((1, 2048, 3)).astype(np.float32))

        def loss_fn(params):
            c, f = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                xyz, train=False,
            )
            return cd_loss_l1(f, gt)

        grads = jax.grad(loss_fn)(variables["params"])
        g_dec = np.concatenate([
            np.abs(np.asarray(g)).ravel()
            for g in jax.tree_util.tree_leaves(grads["encoder"]["decoder_scan"])
        ])
        assert g_dec.max() > 0, "decoder stack got zero gradient"
        g_qp = np.abs(
            np.asarray(grads["decoder"]["query_proj"]["kernel"])
        ).max()
        assert g_qp > 0, "query projection got zero gradient"


class TestPCNNet:
    def test_vn_pointnet_vn_foldingnet(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = PCNNet(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=1024, latent_dim=2048,
        )
        _, (coarse, fine) = init_and_run(model, xyz)
        assert coarse.shape == (1, 1024, 3)
        assert fine.shape == (1, 16384, 3)

    def test_only_coarse(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = PCNNet(enc_type="vn_pointnet", num_coarse=1024, only_coarse=True)
        _, (coarse, fine) = init_and_run(model, xyz)
        assert coarse.shape == (1, 1024, 3) and fine is None

    def test_448_routing(self, rng):
        xyz = jnp.asarray(rng.standard_normal((1, 600, 3)).astype(np.float32))
        model = PCNNet(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=448, latent_dim=2048,
        )
        _, (coarse, fine) = init_and_run(model, xyz)
        assert coarse.shape == (1, 448, 3)
        assert fine.shape == (1, 14336, 3)


class TestPointrInit:
    @pytest.mark.slow
    def test_reinit_matches_reference_distribution(self, rng):
        # the reference's _init_weights: trunc_normal(0.02) Linears,
        # xavier_normal Conv1d, zero biases, unit norm scales
        import jax
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.models.composer import build_model
        from vn_pointcloudcompletion_tpu.training.state import create_train_state
        from vn_pointcloudcompletion_tpu.utils.config import Config

        config = Config.from_dict(
            dict(enc_type="vn_pointr", dec_type="foldingnet", num_coarse=448,
                 latent_dim=2048, only_coarse=True, batch_size=1, lr=1e-4)
        )
        model = build_model(config)
        p = jnp.zeros((1, 600, 3))
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        enc = state.params["encoder"]
        # VN linear kernel: trunc_normal(0.02) -> std ~ 0.0176 (+-2 sigma cut)
        k = enc["vn_increase_dim_0"]["linear"]["kernel"]
        assert 0.015 < float(jnp.std(k)) < 0.02
        assert float(jnp.abs(k).max()) <= 0.04 + 1e-6

    def test_vn_pointr_requires_448(self, rng):
        import jax
        import jax.numpy as jnp
        import pytest as _pytest

        from vn_pointcloudcompletion_tpu.models.composer import PCNNet

        model = PCNNet(enc_type="vn_pointr", num_coarse=1024, only_coarse=True)
        with _pytest.raises(ValueError, match="num_coarse=448"):
            model.init(jax.random.key(0), jnp.zeros((1, 600, 3)), train=False)

    def test_pointr_decoder_requires_vn_pointr(self, rng):
        import jax
        import jax.numpy as jnp
        import pytest as _pytest

        from vn_pointcloudcompletion_tpu.models.composer import PCNNet

        model = PCNNet(enc_type="vn_pointnet", pointr_decoder=True)
        with _pytest.raises(ValueError, match="enc_type='vn_pointr'"):
            model.init(jax.random.key(0), jnp.zeros((1, 600, 3)), train=False)

    def test_pointr_decoder_only_coarse_skips_stack(self, rng):
        """only_coarse discards the fine output, so pointr_decoder must not
        instantiate (or run) the 8-block transformer decoder underneath it."""
        import jax
        import jax.numpy as jnp

        from vn_pointcloudcompletion_tpu.models.composer import PCNNet

        model = PCNNet(
            enc_type="vn_pointr", dec_type="attention_vn_foldingnet",
            num_coarse=448, only_coarse=True, pointr_decoder=True,
        )
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 256, 3)), train=False
        )
        assert "dec_blocks" not in str(
            jax.tree_util.tree_structure(variables)
        )


class TestScanStack:
    """nn.scan transformer tails must equal the unrolled loop they replaced."""

    def test_vn_encoder_scan_equals_unrolled(self, rng):
        from vn_pointcloudcompletion_tpu.models.pointr import (
            _scan_stack,
            _VNEncBlockScan,
        )
        from vn_pointcloudcompletion_tpu.nn.attention import (
            VNBlock,
            to_scalar,
            to_vn,
        )

        L, B, N, C3 = 3, 2, 16, 384
        x = jnp.asarray(rng.standard_normal((B, N, C3)).astype(np.float32) * 0.1)
        pos = jnp.asarray(rng.standard_normal((B, N, C3)).astype(np.float32) * 0.1)
        scan_mod = _scan_stack(_VNEncBlockScan, L)(128, 384, 4, False)
        vs = scan_mod.init(jax.random.key(0), x, pos)
        out, _ = scan_mod.apply(vs, x, pos)

        blk = VNBlock(channels=128, attn_channels=384, num_heads=4)
        cur = x
        for i in range(L):
            sub = {
                "params": jax.tree.map(lambda p: p[i], vs["params"])["block"],
            }
            if "batch_stats" in vs:
                sub["batch_stats"] = jax.tree.map(
                    lambda s: s[i], vs["batch_stats"]
                )["block"]
            cur = to_scalar(blk.apply(sub, to_vn(cur + pos), train=False))
        np.testing.assert_allclose(np.asarray(out), np.asarray(cur),
                                   atol=1e-5)
