"""End-to-end training harness tests on tiny synthetic data (CPU).

Covers: loss decreases under optimisation, checkpoints + resume, frozen
encoder masks, StepLR schedule, and the data-parallel step on the 8-device
virtual CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vn_pointcloudcompletion_tpu.training.state import (
    create_train_state,
    make_optimizer,
    step_lr_schedule,
)
from vn_pointcloudcompletion_tpu.training.steps import make_eval_step, make_train_step
from vn_pointcloudcompletion_tpu.training.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from vn_pointcloudcompletion_tpu.models.composer import PCNNet, build_model
from vn_pointcloudcompletion_tpu.utils.config import Config


def tiny_config(**kw):
    # genuinely tiny: the fast tier's cost is CPU compiles of these jitted
    # steps, and flagship-size (1024/2048) programs took 35 s each.  The
    # mechanics under test are size-independent; full-size coverage lives in
    # test_golden (pcnnet_flagship_small) and the slow tier.
    base = dict(
        enc_type="vn_pointnet",
        dec_type="vn_foldingnet",
        num_coarse=64,
        latent_dim=256,
        only_coarse=True,
        batch_size=2,
        lr=1e-3,
        rotation="none",
        val_rotation="none",
        dataset="synthetic",
        num_workers=1,
    )
    base.update(kw)
    return Config.from_dict(base)


def make_batch(rng, b=2, n=256, m=512):
    p = jnp.asarray(rng.standard_normal((b, n, 3)).astype(np.float32) * 0.2)
    c = jnp.asarray(rng.standard_normal((b, m, 3)).astype(np.float32) * 0.2)
    return p, c


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases(self, rng):
        config = tiny_config(lr=3e-4)
        model = build_model(config)
        p, c = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)
        key = jax.random.key(1)
        losses = []
        # 60 steps with a looser bound catches the same does-it-learn
        # regressions as the original 200-step loop at a third of the cost
        for i in range(60):
            key, k = jax.random.split(key)
            state, metrics = step(state, p, c, k)
            losses.append(float(metrics["total"]))
        # Adam has an initial transient; compare settled tail to the start.
        assert np.mean(losses[-10:]) < 0.97 * losses[0]

    def test_rotation_augmented_step_runs(self, rng):
        config = tiny_config(rotation="so3")
        model = build_model(config)
        p, c = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)
        state, metrics = step(state, p, c, jax.random.key(1))
        assert np.isfinite(float(metrics["total"]))

    def test_dense_path_step(self, rng):
        config = tiny_config(only_coarse=False)
        model = build_model(config)
        p, c = make_batch(rng, m=4096)  # 4096-pt GT: same code path,
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)  # 4x faster CPU compile
        state, metrics = step(state, p, c, jax.random.key(1))
        assert float(metrics["dense"]) > 0

    def test_nonfinite_grad_step_skipped(self, rng):
        """A batch that yields non-finite gradients must not corrupt the
        state: the guarded step (steps.py::guarded_update) keeps the
        previous params and reports skipped=1.  Regression for the bf16
        overflow observed at epoch 64 of the vn_pointr protocol run —
        one inf gradient reaching Adam turned the model into constant
        garbage for the rest of training."""
        config = tiny_config()
        model = build_model(config)
        p, c = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)

        # clean step: params move, nothing skipped
        state1, m1 = step(state, p, c, jax.random.key(1))
        assert float(m1["skipped"]) == 0.0
        import optax
        moved = float(
            optax.global_norm(
                jax.tree.map(lambda a, b: a - b, state1.params, state.params)
            )
        )
        assert moved > 0

        # poisoned batch -> non-finite loss/grads -> state must be kept
        p_bad = p.at[0, 0, 0].set(jnp.inf)
        state2, m2 = step(state1, p_bad, c, jax.random.key(2))
        assert float(m2["skipped"]) == 1.0
        unchanged = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            state2.params, state1.params,
        )
        assert all(jax.tree_util.tree_leaves(unchanged))
        assert int(state2.step) == int(state1.step)

        # and the run recovers: the next clean step updates again
        state3, m3 = step(state2, p, c, jax.random.key(3))
        assert float(m3["skipped"]) == 0.0
        assert np.isfinite(float(m3["total"]))

    @pytest.mark.slow
    def test_vn_pointr_pipeline_train_step(self, rng):
        """Optimizer-level e2e for the vn_pointr pipeline (VNPCTransformer
        encoder + AttentionVNFoldingNet decoder; reference model.py:23-24)
        — previously covered only at model level.  One jitted update must
        produce finite coarse/dense losses and actually move parameters."""
        config = tiny_config(
            enc_type="vn_pointr", dec_type="attention_vn_foldingnet",
            num_coarse=448, only_coarse=False, lr=1e-4, batch_size=1,
        )
        model = build_model(config)
        p, c = make_batch(rng, b=1, n=600, m=2048)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)
        new_state, metrics = step(state, p, c, jax.random.key(1))
        assert np.isfinite(float(metrics["coarse"]))
        assert np.isfinite(float(metrics["dense"]))
        moved = jax.tree_util.tree_reduce(
            lambda acc, pair: acc + float(jnp.sum(jnp.abs(pair))),
            jax.tree_util.tree_map(
                lambda a, b: a.astype(jnp.float32) - b.astype(jnp.float32),
                state.params, new_state.params,
            ),
            0.0,
        )
        assert moved > 0.0

    def test_dcd_coarse_loss(self, rng):
        config = tiny_config(coarse_loss="dcd")
        model = build_model(config)
        p, c = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)
        _, metrics = step(state, p, c, jax.random.key(1))
        assert np.isfinite(float(metrics["coarse"]))

    def test_remat_step_matches_plain(self, rng):
        p_, c_ = make_batch(rng)
        cfg_plain = tiny_config()
        cfg_remat = tiny_config(remat=True)
        model = build_model(cfg_plain)
        state = create_train_state(model, cfg_plain, 10, jax.random.key(0), p_)
        s1, m1 = make_train_step(cfg_plain, jit=True)(state, p_, c_, jax.random.key(1))
        s2, m2 = make_train_step(cfg_remat, jit=True)(state, p_, c_, jax.random.key(1))
        np.testing.assert_allclose(
            float(m1["total"]), float(m2["total"]), rtol=1e-6
        )
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_emd_coarse_loss(self, rng):
        config = tiny_config(coarse_loss="emd")
        model = build_model(config)
        p, c = make_batch(rng, m=2048)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)
        _, metrics = step(state, p, c, jax.random.key(1))
        assert np.isfinite(float(metrics["coarse"]))


class TestOptim:
    def test_step_lr_schedule(self):
        sched = step_lr_schedule(1e-4, steps_per_epoch=10, step_size_epochs=50)
        assert sched(0) == pytest.approx(1e-4)
        assert sched(499) == pytest.approx(1e-4)  # epoch 49
        assert sched(500) == pytest.approx(8e-5)  # epoch 50
        assert sched(1000) == pytest.approx(6.4e-5)  # epoch 100

    def test_frozen_encoder_params_unchanged(self, rng):
        config = tiny_config(freeze_encoder=True)
        model = build_model(config)
        p, c = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        enc_before = jax.tree.map(np.asarray, state.params["encoder"])
        step = make_train_step(config, jit=True)
        state, _ = step(state, p, c, jax.random.key(1))
        enc_after = state.params["encoder"]
        leaves_b = jax.tree.leaves(enc_before)
        leaves_a = jax.tree.leaves(enc_after)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), b)


class TestConfigSnapshots:
    def test_legacy_snapshot_clip_gradient_coerced(self, tmp_path, monkeypatch):
        """Snapshots written while clip_gradient was a no-op (default 0.5,
        no config_version) must not enable clipping when resumed."""
        import json

        from vn_pointcloudcompletion_tpu.utils.config import load_config

        monkeypatch.setenv("OUTPUT_DIR", str(tmp_path))
        exp = tmp_path / "old_exp"
        exp.mkdir()
        (exp / "config.json").write_text(
            json.dumps({"clip_gradient": 0.5, "name": "old"})
        )
        assert load_config("old_exp", root="/").clip_gradient == 0.0

        (exp / "config.json").write_text(
            json.dumps({"clip_gradient": 0.5, "config_version": 2,
                        "name": "new"})
        )
        assert load_config("old_exp", root="/").clip_gradient == 0.5


class TestCheckpoint:
    def test_save_restore_roundtrip(self, rng, tmp_path):
        config = tiny_config()
        model = build_model(config)
        p, c = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=True)
        state, _ = step(state, p, c, jax.random.key(1))

        exp_dir = str(tmp_path)
        os.makedirs(os.path.join(exp_dir, "models"))
        os.makedirs(os.path.join(exp_dir, "optimizer"))
        save_checkpoint(exp_dir, state, epoch=3, best_metrics=0.5,
                        best_epoch=2, name="last")

        fresh = create_train_state(model, config, 10, jax.random.key(9), p)
        restored, epoch, best, best_ep = restore_checkpoint(exp_dir, fresh, "last")
        assert (epoch, best, best_ep) == (3, 0.5, 2)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # restored state must keep stepping identically
        s1, m1 = step(state, p, c, jax.random.key(2))
        s2, m2 = step(restored, p, c, jax.random.key(2))
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]), rtol=1e-6)

    def test_mismatched_pair_detected(self, rng, tmp_path):
        """A crash between the model and optim renames can pair epoch-N
        params with epoch-(N-1) optimizer state; restore must refuse."""
        import shutil

        config = tiny_config()
        model = build_model(config)
        p, _ = make_batch(rng)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        exp_dir = str(tmp_path)
        os.makedirs(os.path.join(exp_dir, "models"))
        os.makedirs(os.path.join(exp_dir, "optimizer"))
        save_checkpoint(exp_dir, state, epoch=3, best_metrics=0.5,
                        best_epoch=2, name="last")
        save_checkpoint(exp_dir, state, epoch=4, best_metrics=0.5,
                        best_epoch=2, name="next")
        # simulate the torn pair: epoch-4 model with the epoch-3 optimizer
        shutil.copy(os.path.join(exp_dir, "models", "model_next.ckpt"),
                    os.path.join(exp_dir, "models", "model_last.ckpt"))
        with pytest.raises(RuntimeError, match="pair mismatch"):
            restore_checkpoint(exp_dir, state, "last")


class TestParallel:
    @pytest.mark.slow
    def test_data_parallel_matches_single_device(self, rng):
        from vn_pointcloudcompletion_tpu.parallel import (
            make_mesh, make_parallel_steps, shard_state,
        )

        assert jax.device_count() == 8
        config = tiny_config(batch_size=8)
        model = build_model(config)
        p, c = make_batch(rng, b=8)
        state = create_train_state(model, config, 10, jax.random.key(0), p)

        mesh = make_mesh()
        ptrain, _, batch_sh = make_parallel_steps(config, mesh)
        pstate = shard_state(state, mesh)
        pp = jax.device_put(p, batch_sh)
        pc = jax.device_put(c, batch_sh)
        pstate, pmetrics = ptrain(pstate, pp, pc, jax.random.key(1))

        sstep = make_train_step(config, jit=True)
        sstate, smetrics = sstep(state, p, c, jax.random.key(1))
        np.testing.assert_allclose(
            float(pmetrics["total"]), float(smetrics["total"]), rtol=1e-4
        )
        # Parameters after one step agree to within the Adam update magnitude:
        # where a gradient is ~0, reduction-order noise can flip the sign of
        # the normalized +-lr update, so the bound is 2*lr + slack.
        lr = 1e-3
        for a, b in zip(jax.tree.leaves(pstate.params),
                        jax.tree.leaves(sstate.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)


class TestTrainerLoop:
    @pytest.mark.slow
    def test_two_epoch_synthetic_run_with_resume(self, tmp_path, monkeypatch):
        monkeypatch.setenv("OUTPUT_DIR", str(tmp_path / "experiments"))
        from vn_pointcloudcompletion_tpu.training.trainer import train
        from vn_pointcloudcompletion_tpu.utils.experiments import create_experiment

        config = tiny_config(
            name="smoke", max_epochs=1, batch_size=2,
        )
        config.extra = {"synthetic_train_samples": 4, "synthetic_val_samples": 2}
        # shrink the clouds via dataset override for speed
        config = create_experiment(config)
        result = train(config, resume=False, max_epochs=1)
        assert result["epochs_run"] == 2  # epochs 0 and 1 inclusive
        assert os.path.exists(
            os.path.join(config.exp_dir, "models", "model_last.ckpt")
        )
        assert os.path.exists(
            os.path.join(config.exp_dir, "visualizations", "epoch_001.png")
        )
        # resume continues past the stored epoch
        result2 = train(config, resume=True, max_epochs=2)
        assert result2["epochs_run"] == 1

    @pytest.mark.slow
    def test_deferred_best_checkpoint_flush(self, tmp_path, monkeypatch):
        """checkpoint_last_every > 1 defers best-checkpoint disk writes to
        the `last` cadence (device-side copy in between), but the final
        model_best on disk must hold the true best epoch's parameters."""
        monkeypatch.setenv("OUTPUT_DIR", str(tmp_path / "experiments"))
        from vn_pointcloudcompletion_tpu.training.checkpoint import (
            restore_checkpoint,
        )
        from vn_pointcloudcompletion_tpu.training.state import (
            create_train_state,
        )
        from vn_pointcloudcompletion_tpu.training.trainer import train
        from vn_pointcloudcompletion_tpu.utils.experiments import (
            create_experiment,
        )

        config = tiny_config(
            name="deferbest", max_epochs=3, batch_size=2,
            checkpoint_last_every=2,
        )
        config.extra = {"synthetic_train_samples": 4, "synthetic_val_samples": 2}
        config = create_experiment(config)
        result = train(config, resume=False)
        assert os.path.exists(
            os.path.join(config.exp_dir, "models", "model_best.ckpt")
        )
        # restore best: its stored epoch must equal the reported best epoch
        # (the deferred write must not have flushed a stale pending copy)
        model = build_model(config)
        p = jnp.zeros((2, 2048, 3), jnp.float32)
        fresh = create_train_state(model, config, 2, jax.random.key(3), p)
        _, epoch, best, best_ep = restore_checkpoint(
            config.exp_dir, fresh, "best"
        )
        assert epoch == result["best_epoch"] == best_ep
        assert best == result["best_cd"]
