"""Jitted train/eval steps — the hot loop (reference train.py:127-186,205-250).

Everything inside one XLA program per step: rotation augmentation (sampled
from the step PRNG key), forward, loss, backward, Adam update, and BN stat
update.  Batch buffers are NOT donated: they can never alias the outputs
(state pytree + scalar metrics), so donation only produced "donated buffers
were not usable" warnings (the parallel step donates its state instead —
parallel/train_parallel.py).

Rotation augmentation applies the *same* rotation to partial and complete
clouds and forwards it to the decoder for seed rotation (train.py:130-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.metrics.losses import (
    calc_dcd,
    cd_loss_l1,
    emd_loss,
)
from vn_pointcloudcompletion_tpu.metrics.metrics import l1_cd
from vn_pointcloudcompletion_tpu.ops.rotations import rotate_points, sample_rotation
from vn_pointcloudcompletion_tpu.utils.config import Config


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of ``tree`` is finite (no inf/NaN)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.array(True)
    return jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]).all()


def guarded_update(state, new_state, ok):
    """Select ``new_state`` where ``ok`` else keep ``state`` (skip the step).

    The bf16 compute path can overflow a backward pass on rare batches (the
    VN norm-BatchNorm fold amplifies cotangents by up to |b|/EPS per layer;
    observed once at epoch 64 of the vn_pointr protocol run): one inf/NaN
    gradient reaching Adam permanently corrupts the parameters, after which
    the model emits constant garbage.  The standard mixed-precision guard —
    torch.cuda.amp's GradScaler skips the optimizer step on non-finite
    grads — keeps the previous state instead; the batch is simply dropped.
    Costs one fused isfinite pass over buffers Adam reads anyway.
    """
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_state, state)


def _coarse_loss(config: Config, coarse, complete):
    if config.coarse_loss == "cd":
        return cd_loss_l1(coarse, complete)
    if config.coarse_loss == "emd":
        # EMD needs equal counts: reference truncates gt to 1024 (train.py:149)
        return emd_loss(coarse, complete[:, : coarse.shape[1], :])
    if config.coarse_loss == "dcd":
        alpha = config.dcd_opts.get("alpha", 200)
        n_lambda = config.dcd_opts.get("lambda", 0.5)
        loss, _, _ = calc_dcd(coarse, complete, alpha=alpha, n_lambda=n_lambda)
        return loss.mean()
    raise ValueError(f"Not implemented loss {config.coarse_loss}")


def make_train_step(config: Config, jit: bool = True):
    """Build the jitted train step for a given static config."""

    def train_step(state, partial, complete, rng):
        rot = sample_rotation(rng, config.rotation, partial.shape[0])
        if rot is not None:
            partial = rotate_points(partial, rot)
            complete = rotate_points(complete, rot)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}

            def fwd(variables, partial, rot):
                return state.apply_fn(
                    variables, partial, rot, train=True, mutable=["batch_stats"]
                )

            if config.remat:
                # trade recompute for activation memory (jax.checkpoint) —
                # lets memory-bound configs run larger batches
                fwd = jax.checkpoint(fwd)
            (coarse, fine), mutated = fwd(variables, partial, rot)
            loss1 = _coarse_loss(config, coarse, complete)
            if config.only_coarse:
                loss2 = jnp.zeros(())
                loss = loss1
            else:
                loss2 = cd_loss_l1(fine, complete)
                loss = loss1 + loss2
            return loss, (loss1, loss2, mutated)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss1, loss2, mutated)), grads = grad_fn(state.params)
        ok = jnp.logical_and(all_finite(grads), jnp.isfinite(loss))
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mutated["batch_stats"]
        )
        state = guarded_update(state, new_state, ok)
        metrics = {
            "total": loss, "coarse": loss1, "dense": loss2,
            "skipped": (~ok).astype(jnp.float32),
        }
        return state, metrics

    if jit:
        return jax.jit(train_step)
    return train_step


def make_eval_step(config: Config, jit: bool = True):
    """Validation step: l1_cd sums for coarse/dense (train.py:205-226)."""

    def eval_step(state, partial, complete, rng):
        rot = sample_rotation(rng, config.val_rotation, partial.shape[0])
        if rot is not None:
            partial = rotate_points(partial, rot)
            complete = rotate_points(complete, rot)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        coarse, fine = state.apply_fn(variables, partial, rot, train=False)
        out = {"coarse_sum": l1_cd(coarse, complete)}
        if not config.only_coarse:
            out["dense_sum"] = l1_cd(fine, complete)
        else:
            out["dense_sum"] = jnp.zeros(())
        return out, (partial, coarse, fine, complete)

    if jit:
        return jax.jit(eval_step)
    return eval_step
