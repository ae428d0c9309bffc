"""bfloat16 compute-path smoke tests (f32 remains the exact default)."""

import jax
import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.nn.precision import (
    compute_dtype,
    compute_dtype_scope,
)


class TestBF16:
    def test_default_is_f32(self):
        assert compute_dtype() == jnp.float32

    def test_model_runs_and_outputs_f32(self, rng):
        from vn_pointcloudcompletion_tpu.models.composer import PCNNet

        xyz = jnp.asarray(rng.standard_normal((1, 128, 3)).astype(np.float32) * 0.2)
        with compute_dtype_scope(jnp.bfloat16):
            model = PCNNet(
                enc_type="vn_pointnet", dec_type="vn_foldingnet",
                num_coarse=64, latent_dim=2048, only_coarse=False,
            )
            variables = model.init(jax.random.key(0), xyz, train=False)
            coarse, fine = model.apply(variables, xyz, train=False)
        assert coarse.dtype == jnp.float32 and fine.dtype == jnp.float32
        assert np.isfinite(np.asarray(coarse)).all()
        assert np.isfinite(np.asarray(fine)).all()

    def test_bf16_output_close_to_f32_as_point_cloud(self, rng):
        # Pointwise equivariance is NOT preserved under bf16: a single
        # argmax flip in the global VNMaxPool shifts every output point.
        # The meaningful contract is that the *cloud* stays close.
        from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1
        from vn_pointcloudcompletion_tpu.models.pcn import VNPointNet

        xyz = jnp.asarray(rng.standard_normal((1, 64, 3)).astype(np.float32) * 0.2)
        model = VNPointNet(num_coarse=32, latent_dim=8)
        variables = model.init(jax.random.key(0), xyz, train=False)
        c_f32, _ = model.apply(variables, xyz, train=False)
        with compute_dtype_scope(jnp.bfloat16):
            c_bf16, _ = model.apply(variables, xyz, train=False)
        # normalise by the input cloud scale (the output cloud at init is
        # near-degenerate, so its own scale is a noise amplifier)
        scale = float(jnp.abs(xyz).max())
        cd = float(cd_loss_l1(c_bf16.astype(jnp.float32), c_f32))
        assert cd / scale < 0.05

    def test_bf16_grads_finite(self, rng):
        from vn_pointcloudcompletion_tpu.models.composer import build_model
        from vn_pointcloudcompletion_tpu.training.state import create_train_state
        from vn_pointcloudcompletion_tpu.training.steps import make_train_step
        from vn_pointcloudcompletion_tpu.utils.config import Config

        with compute_dtype_scope(jnp.bfloat16):
            config = Config.from_dict(
                dict(enc_type="vn_pointnet", dec_type="vn_foldingnet",
                     num_coarse=64, latent_dim=2048, only_coarse=True,
                     batch_size=2, lr=1e-3, rotation="none", dtype="bfloat16")
            )
            model = build_model(config)
            p = jnp.asarray(rng.standard_normal((2, 128, 3)).astype(np.float32) * 0.2)
            c = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32) * 0.2)
            state = create_train_state(model, config, 10, jax.random.key(0), p)
            step = make_train_step(config, jit=True)
            state, metrics = step(state, p, c, jax.random.key(1))
        assert np.isfinite(float(metrics["total"]))
        for leaf in jax.tree.leaves(state.params):
            assert np.isfinite(np.asarray(leaf)).all()


class TestActivationDtype:
    def test_noop_under_default_f32_policy(self):
        from vn_pointcloudcompletion_tpu.nn.precision import activation_dtype

        x32 = jnp.zeros((2, 3), jnp.float32)
        x64 = np.zeros((2, 3), np.float64)  # f64 parity harnesses pass through
        assert activation_dtype(x32).dtype == jnp.float32
        assert activation_dtype(jnp.bfloat16(x32)).dtype == jnp.bfloat16
        assert np.asarray(activation_dtype(x64)).dtype == np.float64

    def test_casts_down_under_bf16_policy(self):
        from vn_pointcloudcompletion_tpu.nn.precision import activation_dtype

        with compute_dtype_scope(jnp.bfloat16):
            assert activation_dtype(jnp.zeros((2,), jnp.float32)).dtype \
                == jnp.bfloat16
            # integer index tensors must never be touched
            assert activation_dtype(jnp.zeros((2,), jnp.int32)).dtype \
                == jnp.int32

    def test_attention_decoder_bf16_outputs_f32(self, rng):
        # the fold-seed constants are f32 by construction; under the bf16
        # policy the decoder must cast them at entry (not promote the fold
        # chain) and still hand back f32 points for the residual add
        from vn_pointcloudcompletion_tpu.models.pcn import AttentionVNFoldingNet

        # tiny 64-coarse config: the dtype policy under test is
        # size-independent, and the 448/2048 variant costs 35 s of CPU
        # compile in the fast tier
        coarse = jnp.asarray(
            rng.standard_normal((1, 64, 3)).astype(np.float32) * 0.2)
        feat = jnp.asarray(
            rng.standard_normal((1, 256, 3, 1)).astype(np.float32))
        with compute_dtype_scope(jnp.bfloat16):
            model = AttentionVNFoldingNet(num_coarse=64, latent_dim=256)
            variables = model.init(jax.random.key(0), coarse, feat,
                                   train=False)
            dense = model.apply(variables, coarse, feat, train=False)
        assert dense.dtype == jnp.float32
        assert dense.shape == (1, 64 * 16, 3)
        assert np.isfinite(np.asarray(dense)).all()

class TestVNGrouperBF16Trunk:
    """The VN grouper trunk must train stably under the bf16 policy.

    The historical hazard: a real 8-category bf16 protocol run NaNed at
    step 2, bisected to the grouper trunk.  Root cause was the norm VJP at
    exactly-zero edge vectors (duplicate points cancel exactly; bf16 makes
    near-duplicates cancel too) — now guarded by ``nn.vn.safe_norm``, so
    the trunk runs bf16 end-to-end (it was briefly an f32 island).  This
    repro (reference trunc_normal(0.02) reinit + duplicate-heavy cloud)
    NaNed before the guard and pins the fix.
    """

    def test_grouper_grads_finite_bf16_tiny_init(self, rng):
        import optax
        from vn_pointcloudcompletion_tpu.models.pointr import (
            VNDGCNNGrouper,
            reinit_pointr_params,
        )

        # duplicate-heavy cloud (resample-pad semantics): half the points
        # are exact copies, making zero edge-differences common
        base = rng.standard_normal((2, 512, 3)).astype(np.float32) * 0.3
        xyz = jnp.asarray(np.concatenate([base, base], axis=1))  # (2,1024,3)
        model = VNDGCNNGrouper()
        with compute_dtype_scope(jnp.bfloat16):
            variables = jax.jit(
                lambda r, x: model.init(r, x, train=True)
            )(jax.random.key(0), xyz)
            params = reinit_pointr_params(
                variables["params"], jax.random.key(1)
            )

            def loss(p):
                (coor, f), _ = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    xyz, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(f.astype(jnp.float32) ** 2)

            grads = jax.jit(jax.grad(loss))(params)
        assert np.isfinite(float(optax.global_norm(grads)))

    def test_grouper_outputs_policy_dtype(self, rng):
        from vn_pointcloudcompletion_tpu.models.pointr import VNDGCNNGrouper

        xyz = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
        model = VNDGCNNGrouper()
        variables = model.init(jax.random.key(0), xyz, train=False)
        coor, f = model.apply(variables, xyz, train=False)
        assert coor.dtype == jnp.float32 and f.dtype == jnp.float32
        with compute_dtype_scope(jnp.bfloat16):
            coor, f = model.apply(variables, xyz, train=False)
        # policy boundary: under bf16 the contract hands back bf16
        assert coor.dtype == jnp.bfloat16 and f.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(f, np.float32)).all()

class TestVNDGCNNfpsBF16Trunk:
    """VNDGCNNfps carries the same edge-trunk bf16 hazard as the grouper:
    the 8-category protocol run showed a chronic ~25% non-finite-gradient
    skip rate from epoch 0 under bf16 until the zero-vector norm VJP was
    guarded (``nn.vn.safe_norm``); the trunk runs bf16 end-to-end."""

    def test_encoder_grads_finite_bf16(self, rng):
        import optax
        from vn_pointcloudcompletion_tpu.models.dgcnn import VNDGCNNfps

        # duplicate-heavy cloud: resample-pad semantics make exact copies
        # (zero edge differences) common in real batches
        base = rng.standard_normal((2, 512, 3)).astype(np.float32) * 0.3
        xyz = jnp.asarray(np.concatenate([base, base], axis=1))  # (2,1024,3)
        model = VNDGCNNfps(num_coarse=64)
        with compute_dtype_scope(jnp.bfloat16):
            variables = jax.jit(
                lambda r, x: model.init(r, x, train=True)
            )(jax.random.key(0), xyz)

            def loss(p):
                (coarse, gf), _ = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]},
                    xyz, train=True, mutable=["batch_stats"],
                )
                return jnp.sum(coarse.astype(jnp.float32) ** 2) + jnp.sum(
                    gf.astype(jnp.float32) ** 2
                )

            grads = jax.jit(jax.grad(loss))(variables["params"])
        assert np.isfinite(float(optax.global_norm(grads)))

    def test_encoder_outputs_policy_dtype(self, rng):
        from vn_pointcloudcompletion_tpu.models.dgcnn import VNDGCNNfps

        xyz = jnp.asarray(rng.standard_normal((1, 256, 3)).astype(np.float32))
        model = VNDGCNNfps(num_coarse=64)
        variables = model.init(jax.random.key(0), xyz, train=False)
        coarse, gf = model.apply(variables, xyz, train=False)
        assert coarse.dtype == jnp.float32 and gf.dtype == jnp.float32
        with compute_dtype_scope(jnp.bfloat16):
            coarse, gf = model.apply(variables, xyz, train=False)
        assert coarse.dtype == jnp.bfloat16 and gf.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(gf, np.float32)).all()
