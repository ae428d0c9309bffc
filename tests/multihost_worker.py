"""Worker process for the real 2-process multi-host input-path test.

Launched (twice) by ``tests/test_multihost.py``.  Each process owns 4
virtual CPU devices, joins an 8-device global mesh via
``jax.distributed.initialize``, shards the on-disk dataset by
``jax.process_index()`` (data/shapenet.py), stages its process-local batch
rows with ``make_array_from_process_local_data`` (data/pipeline.py
``stage_batch``) and runs the sharded train step (parallel/train_parallel.py)
for a full epoch.  This is the production multi-host path that was
previously only exercised degenerately at process_count=1.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--root", required=True)
    ap.add_argument("--batch", type=int, default=8, help="GLOBAL batch size")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    # force OUR local device count even if the caller's env already carries a
    # different xla_force_host_platform_device_count (tests/conftest.py uses 8)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        os.environ.get("XLA_FLAGS", ""),
    )
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.nproc,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nproc
    assert len(jax.devices()) == args.nproc * args.local_devices

    import jax.numpy as jnp

    from vn_pointcloudcompletion_tpu.data.pipeline import (
        BatchLoader,
        device_prefetch,
    )
    from vn_pointcloudcompletion_tpu.data.shapenet import ShapeNetPCN
    from vn_pointcloudcompletion_tpu.models.composer import build_model
    from vn_pointcloudcompletion_tpu.parallel import (
        make_mesh,
        make_parallel_steps,
        shard_state,
    )
    from vn_pointcloudcompletion_tpu.training.state import create_train_state
    from vn_pointcloudcompletion_tpu.utils.config import Config

    config = Config.from_dict(dict(
        enc_type="vn_pointnet", dec_type=None, only_coarse=True,
        num_coarse=64, latent_dim=64, batch_size=args.batch, lr=1e-4,
        rotation="none",
    ))
    ds = ShapeNetPCN(
        args.root, "train",
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    local_bs = config.batch_size // jax.process_count()
    loader = BatchLoader(ds, local_bs, shuffle=False, num_workers=2,
                         drop_last=True)
    mesh = make_mesh()
    ptrain, _, batch_sh = make_parallel_steps(config, mesh)
    model = build_model(config)
    example = jnp.zeros((config.batch_size, 2048, 3), jnp.float32)
    state = shard_state(
        create_train_state(model, config, 100, jax.random.key(0), example),
        mesh,
    )

    key = jax.random.key(1)
    losses = []
    loader.set_epoch(0)
    for partial, complete in device_prefetch(loader, size=2,
                                             sharding=batch_sh):
        key, k = jax.random.split(key)
        state, metrics = ptrain(state, partial, complete, k)
        losses.append(float(metrics["total"]))

    checksum = float(jax.jit(
        lambda p: jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), p, 0.0
        ),
    )(state.params))

    with open(args.out, "w") as f:
        json.dump({
            "pid": args.pid,
            "process_count": jax.process_count(),
            "global_devices": len(jax.devices()),
            "local_models": len(ds),
            "steps": len(losses),
            "losses": losses,
            "param_checksum": checksum,
        }, f)
    print(f"worker {args.pid}: {len(losses)} steps ok", flush=True)


if __name__ == "__main__":
    main()
