#!/usr/bin/env python
"""Benchmark: completions/sec/chip on the flagship pipeline at 16384 points.

Measures the full jitted training step (forward + Chamfer losses + backward +
Adam update) of vn_pointnet + vn_foldingnet on synthetic data resident in
HBM, which is the BASELINE.json headline metric.  Prints ONE JSON line.

The reference publishes no numbers (BASELINE.json "published": {}), so
``vs_baseline`` is null; the recorded value tracks round-over-round progress.
"""

from __future__ import annotations

import json
import os
import time

# Persistent XLA compilation cache, set BEFORE the first jax import: the
# round-3 driver capture lost every secondary entry to its time budget
# because cold compiles through the tunnel consumed it (headline alone
# ~1200 s cold vs ~40 s warm).  Keyed by HLO hash (stale entries are
# impossible); the in-round pre-warm run populates it so the driver's
# end-of-round invocation measures throughput, not compile time.  Same
# pattern as tests/conftest.py.  Opt out with JAX_BENCH_CACHE=0.
if os.environ.get("JAX_BENCH_CACHE", "1") != "0":
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_bench_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def bench_train_step(batch_size: int = 16, iters: int = 20, warmup: int = 3,
                     dtype: str = "bfloat16"):
    """Flagship headline pipeline — one definition of the timing protocol
    (bench_pipeline) serves the headline and the extras alike."""
    return bench_pipeline(
        "vn_pointnet", "vn_foldingnet", 1024, 16384,
        batch_size=batch_size, iters=iters, warmup=warmup, dtype=dtype,
    )


def bench_pipeline(enc_type, dec_type, num_coarse, n_complete,
                   batch_size: int = 8, iters: int = 10, warmup: int = 2,
                   dtype: str = "bfloat16"):
    """Generic train-step throughput for any encoder/decoder pair."""
    from vn_pointcloudcompletion_tpu.models.composer import build_model
    from vn_pointcloudcompletion_tpu.nn.precision import (
        from_config_dtype,
        set_compute_dtype,
    )
    from vn_pointcloudcompletion_tpu.training.state import create_train_state
    from vn_pointcloudcompletion_tpu.training.steps import make_train_step
    from vn_pointcloudcompletion_tpu.utils.config import Config

    set_compute_dtype(from_config_dtype(dtype))
    config = Config.from_dict(
        dict(
            enc_type=enc_type, dec_type=dec_type,
            num_coarse=num_coarse, latent_dim=2048,
            only_coarse=dec_type is None,
            batch_size=batch_size, lr=1e-4, rotation="so3", dtype=dtype,
        )
    )
    model = build_model(config)
    rng = np.random.default_rng(0)
    partial = jnp.asarray(
        rng.standard_normal((batch_size, 2048, 3)), jnp.float32) * 0.2
    complete = jnp.asarray(
        rng.standard_normal((batch_size, n_complete, 3)), jnp.float32) * 0.2
    state = create_train_state(model, config, 100, jax.random.key(0), partial)
    step = jax.jit(make_train_step(config, jit=False))
    key = jax.random.key(1)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        state, metrics = step(state, partial, complete, k)
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, partial, complete, k)
    float(metrics["total"])
    dt = time.perf_counter() - t0
    return iters / dt * batch_size, iters / dt


def bench_eval_step(batch_size: int = 16, iters: int = 10, warmup: int = 2):
    """Test-harness (metric-step) throughput on the flagship: fwd + CD-L1/L2
    + F-score + voxel IoU, jitted — the reference eval bottleneck."""
    from vn_pointcloudcompletion_tpu.models.composer import build_model
    from vn_pointcloudcompletion_tpu.nn.precision import (
        from_config_dtype,
        set_compute_dtype,
    )
    from vn_pointcloudcompletion_tpu.training.evaluate import _make_metric_step
    from vn_pointcloudcompletion_tpu.training.state import create_train_state
    from vn_pointcloudcompletion_tpu.utils.config import Config

    set_compute_dtype(from_config_dtype("bfloat16"))
    config = Config.from_dict(
        dict(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=1024, latent_dim=2048, only_coarse=False,
            batch_size=batch_size, lr=1e-4, test_rotation="so3",
            dtype="bfloat16",
        )
    )
    model = build_model(config)
    rng = np.random.default_rng(0)
    partial = jnp.asarray(
        rng.standard_normal((batch_size, 2048, 3)), jnp.float32) * 0.2
    complete = jnp.asarray(
        rng.standard_normal((batch_size, 16384, 3)), jnp.float32) * 0.2
    state = create_train_state(model, config, 1, jax.random.key(0), partial)
    metric_step = _make_metric_step(config)
    key = jax.random.key(1)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        out, _ = metric_step(state, partial, complete, k)
    float(out["l1"][0])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        out, _ = metric_step(state, partial, complete, k)
    float(out["l1"][0])
    dt = time.perf_counter() - t0
    return iters / dt * batch_size, iters / dt


def bench_infer(batch_size: int = 32, iters: int = 10, warmup: int = 2):
    """Pure serving path: flagship model forward only (partial -> 16384-pt
    completion), eval mode, bf16, no metrics — the deployment-inference
    number, distinct from the metric-step eval entry."""
    from vn_pointcloudcompletion_tpu.models.composer import build_model
    from vn_pointcloudcompletion_tpu.nn.precision import (
        from_config_dtype,
        set_compute_dtype,
    )
    from vn_pointcloudcompletion_tpu.training.state import create_train_state
    from vn_pointcloudcompletion_tpu.utils.config import Config

    set_compute_dtype(from_config_dtype("bfloat16"))
    config = Config.from_dict(
        dict(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=1024, latent_dim=2048, only_coarse=False,
            batch_size=batch_size, lr=1e-4, dtype="bfloat16",
        )
    )
    model = build_model(config)
    rng = np.random.default_rng(0)
    partial = jnp.asarray(
        rng.standard_normal((batch_size, 2048, 3)), jnp.float32) * 0.2
    state = create_train_state(model, config, 1, jax.random.key(0), partial)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda v, p: model.apply(v, p, train=False)[1])
    for _ in range(warmup):
        fine = fwd(variables, partial)
    float(fine[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        fine = fwd(variables, partial)
    float(fine[0, 0, 0])
    dt = time.perf_counter() - t0
    return iters / dt * batch_size, iters / dt


def bench_emd_eval(batch_size: int = 8, iters: int = 5, warmup: int = 1):
    """Batched streaming approx-EMD at 16384 points (the --emd eval path).

    The blocked kernel never materialises the (M, N) soft match (1 GB/sample
    dense), so the whole batch evaluates at once — the reference's EMD eval
    is one sample at a time on a CUDA kernel."""
    from vn_pointcloudcompletion_tpu.ops.emd import earth_mover_distance_blocked

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((batch_size, 16384, 3)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((batch_size, 16384, 3)), jnp.float32) * 0.2
    fn = jax.jit(earth_mover_distance_blocked)
    for _ in range(warmup):
        out = fn(a, b)
    float(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, b)
    float(out[0])
    dt = time.perf_counter() - t0
    return iters / dt * batch_size, iters / dt


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast if the backend is unreachable (e.g. a dead axon tunnel).

    Initialising a tunnelled TPU backend in-process can hang indefinitely;
    probing device count in a throwaway subprocess bounds that.  Exits
    non-zero with a clear message so a harness records an infrastructure
    failure rather than a hang or a fake perf number."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        ok = out.returncode == 0 and int(out.stdout.strip().splitlines()[-1]) > 0
    except Exception:
        ok = False
    if not ok:
        print("bench.py: JAX backend unreachable (device probe failed/timed "
              "out) — not a model perf regression", file=sys.stderr)
        raise SystemExit(2)


def main():
    t_start = time.perf_counter()
    _probe_backend()
    completions_per_sec, steps_per_sec = bench_train_step()
    extras = {}
    # extra pipelines are best-effort: stop adding them when the total run
    # approaches the driver's patience (compiles dominate, ~1-2 min each)
    # measured: all six entries compile + run in ~17 min on an idle chip
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    for name, args in (
        ("vn_pointr_train", ("vn_pointr", "attention_vn_foldingnet", 448, 14336)),
        ("dgcnn_fps_train", ("dgcnn_fps", "foldingnet", 1024, 16384)),
        ("vn_dgcnn_fps_train", ("vn_dgcnn_fps", "vn_foldingnet", 1024, 16384)),
    ):
        if time.perf_counter() - t_start > budget_s:
            extras[name] = {"skipped": "time budget"}
            continue
        try:
            cps, sps = bench_pipeline(*args)
            extras[name] = {"completions_per_sec": round(cps, 2),
                            "steps_per_sec": round(sps, 3), "batch_size": 8}
        except Exception as e:  # never let a side entry kill the headline
            extras[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
    try:
        if time.perf_counter() - t_start > budget_s:
            raise TimeoutError("time budget")
        cps, sps = bench_eval_step()
        extras["flagship_eval"] = {"completions_per_sec": round(cps, 2),
                                   "steps_per_sec": round(sps, 3),
                                   "batch_size": 16}
    except Exception as e:
        extras["flagship_eval"] = {"error": f"{type(e).__name__}: {e}"[:160]}
    try:
        if time.perf_counter() - t_start > budget_s:
            raise TimeoutError("time budget")
        cps, sps = bench_infer()
        extras["flagship_infer"] = {"completions_per_sec": round(cps, 2),
                                    "steps_per_sec": round(sps, 3),
                                    "batch_size": 32}
    except Exception as e:
        extras["flagship_infer"] = {"error": f"{type(e).__name__}: {e}"[:160]}
    try:
        if time.perf_counter() - t_start > budget_s:
            raise TimeoutError("time budget")
        cps, sps = bench_emd_eval()
        extras["emd_eval_16384"] = {"clouds_per_sec": round(cps, 2),
                                    "batches_per_sec": round(sps, 3),
                                    "batch_size": 8}
    except Exception as e:
        extras["emd_eval_16384"] = {"error": f"{type(e).__name__}: {e}"[:160]}
    try:
        # multichip-efficiency tracker: sharded step on a virtual CPU mesh
        # at sizes 1/2/4/8, run in a subprocess so this process's TPU
        # backend stays untouched (shape of scaling, not absolute speed)
        import subprocess
        import sys

        if time.perf_counter() - t_start > budget_s:
            raise TimeoutError("time budget")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()
        out = subprocess.run(
            [sys.executable, "-m",
             "vn_pointcloudcompletion_tpu.parallel.mesh_bench"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"mesh_bench rc={out.returncode}: {out.stderr.strip()[-200:]}"
            )
        extras["mesh_scaling"] = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:
        extras["mesh_scaling"] = {"error": f"{type(e).__name__}: {e}"[:360]}
    print(
        json.dumps(
            {
                "metric": "train_completions_per_sec_per_chip_16384pts",
                "value": round(completions_per_sec, 3),
                "unit": "completions/s/chip",
                "vs_baseline": None,
                "detail": {
                    "steps_per_sec": round(steps_per_sec, 4),
                    "pipeline": "vn_pointnet+vn_foldingnet train step (fwd+cd losses+bwd+adam, so3 aug)",
                    "batch_size": 16,
                    "device": str(jax.devices()[0]),
                    "extra_pipelines": extras,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
