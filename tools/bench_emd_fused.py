"""On-chip A/B of the fused-annealing EMD kernel vs the streamed XLA path.

Run from /root/repo:  python tools/bench_emd_fused.py [batch] [npts]
Prints one JSON line with clouds/s for both paths and the max deviation.
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_bench_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    from vn_pointcloudcompletion_tpu.ops.emd import _emd_blocked_impl
    from vn_pointcloudcompletion_tpu.ops.emd_pallas import emd_rounds_pallas

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32) * 0.2
    c = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32) * 0.2

    fused = jax.jit(lambda x, y: emd_rounds_pallas(x, y))
    # _emd_blocked_impl dispatches at TRACE time: pin the env var before
    # the first call so "streamed" really is the lax.map path
    os.environ["VN_EMD_FUSED"] = "0"
    streamed = jax.jit(lambda x, y: _emd_blocked_impl(x, y, 512))

    out = {}
    for name, fn in (("fused", fused), ("streamed", streamed)):
        t0 = time.perf_counter()
        res = fn(a, c)
        float(res[0][0])
        out[f"{name}_first_s"] = round(time.perf_counter() - t0, 1)
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            res = fn(a, c)
        float(res[0][0])
        dt = time.perf_counter() - t0
        out[f"{name}_clouds_per_s"] = round(iters * b / dt, 2)
        out[f"{name}_ms_per_cloud"] = round(dt / iters / b * 1e3, 2)

    rf = fused(a, c)
    rs = streamed(a, c)
    out["cost_rel_dev"] = float(
        np.abs(np.asarray(rf[0]) - np.asarray(rs[0])).max()
        / max(np.abs(np.asarray(rs[0])).max(), 1e-9)
    )
    out["t_n_abs_dev"] = float(
        np.abs(np.asarray(rf[2]) - np.asarray(rs[2])).max()
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
