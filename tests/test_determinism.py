"""Determinism tests — the functional replacement for race detection.

The reference's CUDA chamfer backward uses atomicAdd (nondeterministic
accumulation order, chamfer3D.cu:166-171); under XLA everything is
deterministic by construction (SURVEY.md §5).  These tests pin that: the
same step on the same inputs must produce bitwise-identical results.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.models.composer import build_model
from vn_pointcloudcompletion_tpu.training.state import create_train_state
from vn_pointcloudcompletion_tpu.training.steps import make_train_step
from vn_pointcloudcompletion_tpu.utils.config import Config


class TestDeterminism:
    def test_train_step_bitwise_deterministic(self, rng):
        config = Config.from_dict(
            dict(enc_type="vn_pointnet", dec_type="vn_foldingnet",
                 # bitwise determinism is size-independent; latent 2048
                 # costs ~20 s of CPU compile in the fast tier
                 num_coarse=64, latent_dim=256, only_coarse=False,
                 batch_size=2, lr=1e-3, rotation="so3")
        )
        model = build_model(config)
        p = jnp.asarray(rng.standard_normal((2, 256, 3)).astype(np.float32) * 0.2)
        c = jnp.asarray(rng.standard_normal((2, 1024, 3)).astype(np.float32) * 0.2)
        state = create_train_state(model, config, 10, jax.random.key(0), p)
        step = make_train_step(config, jit=False)  # no donation: reuse inputs
        step = jax.jit(step)

        s1, m1 = step(state, p, c, jax.random.key(7))
        s2, m2 = step(state, p, c, jax.random.key(7))
        assert float(m1["total"]) == float(m2["total"])
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_chamfer_backward_deterministic(self, rng):
        # the op whose reference counterpart is atomicAdd-nondeterministic
        from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1

        x = jnp.asarray(rng.standard_normal((2, 300, 3)).astype(np.float32))
        y = jnp.asarray(rng.standard_normal((2, 500, 3)).astype(np.float32))
        g = jax.jit(jax.grad(lambda a: cd_loss_l1(a, y)))
        g1, g2 = g(x), g(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
