"""Virtual-mesh data-parallel scaling probe (VERDICT r2 #8).

Runs the sharded train step (parallel/train_parallel.py) on an
``xla_force_host_platform_device_count`` CPU mesh at sizes 1/2/4/8 with a
fixed GLOBAL batch and reports steps/s per size.  The point is the *shape*
of the scaling curve (does the psum/sharding layout scale?), not absolute
speed — CPU "devices" are threads on one host.  ``bench.py`` runs this in a
subprocess so the TPU process never re-initialises its backend.

Interpretation: flat (speedup ~1 at every size) means the sharding layout
adds no collective overhead as the mesh grows.  On a single-core host
(``host_cores`` in the output) the larger sizes pay real thread-
coordination cost, so a mild downward slope there is the host, not the
layout; per-size rates are best-of-chunks to damp scheduler noise.

Usage: ``python -m vn_pointcloudcompletion_tpu.parallel.mesh_bench``
prints ONE JSON line: {"steps_per_sec": {"1": ..., "2": ...}, ...}.
"""

from __future__ import annotations

import json
import os
import time


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vn_pointcloudcompletion_tpu.models.composer import build_model
    from vn_pointcloudcompletion_tpu.parallel import (
        make_mesh,
        make_parallel_steps,
        shard_state,
    )
    from vn_pointcloudcompletion_tpu.training.state import create_train_state
    from vn_pointcloudcompletion_tpu.utils.config import Config

    # small model: the probe tracks sharding/collective overhead vs mesh
    # size (ideal = flat: fixed global batch, shared host cores), so model
    # scale only slows the probe down
    batch, iters, warmup = 8, 6, 2
    config = Config.from_dict(dict(
        enc_type="vn_pointnet", dec_type="vn_foldingnet",
        num_coarse=256, latent_dim=512, only_coarse=True,
        batch_size=batch, lr=1e-4, rotation="none",
    ))
    model = build_model(config)
    rng = np.random.default_rng(0)
    partial = jnp.asarray(
        rng.standard_normal((batch, 512, 3)), jnp.float32) * 0.2
    complete = jnp.asarray(
        rng.standard_normal((batch, 2048, 3)), jnp.float32) * 0.2
    results = {}
    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        ptrain, _, batch_sh = make_parallel_steps(config, mesh)
        # fresh state per mesh: the train step donates its state, and on the
        # 1-device mesh shard_state aliases rather than copies
        state = shard_state(
            create_train_state(model, config, 100, jax.random.key(0), partial),
            mesh,
        )
        pp = jax.device_put(partial, batch_sh)
        pc = jax.device_put(complete, batch_sh)
        key = jax.random.key(1)
        for _ in range(warmup):
            key, k = jax.random.split(key)
            state, metrics = ptrain(state, pp, pc, k)
        float(metrics["total"])
        # best-of-chunks: on a shared/low-core host the 8-thread mesh sizes
        # are at the mercy of the scheduler; the fastest chunk is the stable
        # estimate of the sharding layout's own cost (same total work as a
        # single timed loop, each step is seconds long so 2-step chunks
        # still time cleanly)
        chunk = 2
        best = 0.0
        # max(1, ...): iters < chunk must still time one chunk, or ``best``
        # stays 0.0 and speedup_vs_1 divides by zero
        for _ in range(max(1, iters // chunk)):
            t0 = time.perf_counter()
            for _ in range(chunk):
                key, k = jax.random.split(key)
                state, metrics = ptrain(state, pp, pc, k)
            float(metrics["total"])
            best = max(best, chunk / (time.perf_counter() - t0))
        results[str(n_dev)] = round(best, 3)

    base = results["1"]
    print(json.dumps({
        "steps_per_sec": results,
        "speedup_vs_1": {k: round(v / base, 2) for k, v in results.items()},
        "global_batch": batch,
        "platform": "cpu-virtual",
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
