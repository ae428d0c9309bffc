"""Data-parallel train/eval steps over a device mesh.

Same pure step functions as ``training/steps.py``, jitted with explicit
shardings: state replicated, batch sharded on the ``data`` axis.  XLA's
sharding propagation turns the gradient reduction into one ``psum`` over ICI
— the only collective the workload needs (SURVEY.md §2c/§5).

Per-device batch rotation augmentation stays correct because the PRNG key is
replicated and rotations are sampled for the *global* batch then sharded with
it (rotation sampling happens inside the step from the same key on every
device; the slice each device computes is its own batch shard).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from vn_pointcloudcompletion_tpu.training.steps import make_eval_step, make_train_step
from vn_pointcloudcompletion_tpu.utils.config import Config


def shard_state(state, mesh):
    """Replicate the train state across the mesh.

    Always materialises FRESH buffers (jit identity with explicit output
    sharding): the parallel train step donates its state argument, and a
    plain device_put can alias the caller's buffers when a shard already
    lives on the source device — donation would then delete the caller's
    copy out from under it.
    """
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda s: s, out_shardings=rep)(state)


def make_parallel_steps(config: Config, mesh):
    """Returns (train_step, eval_step, batch_sharding) jitted over the mesh."""
    n_data = mesh.shape["data"]
    if config.batch_size % n_data != 0:
        raise ValueError(
            f"batch_size={config.batch_size} must be divisible by the mesh's "
            f"'data' axis size {n_data}"
        )
    rep = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    train_fn = make_train_step(config, jit=False)
    eval_fn = make_eval_step(config, jit=False)

    # donate the STATE (returned updated with identical layout, so XLA can
    # alias it); the batch shards have no matching output layout and donating
    # them only produced "donated buffers were not usable" warnings + a copy
    train_step = jax.jit(
        train_fn,
        in_shardings=(rep, batch_sh, batch_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(
        eval_fn,
        in_shardings=(rep, batch_sh, batch_sh, rep),
    )
    return train_step, eval_step, batch_sh
