#!/usr/bin/env python
"""On-device kernel self-test: every Pallas kernel vs its portable fallback.

The CPU test suite exercises kernel *semantics* in interpret mode; what it
cannot catch is a Mosaic/XLA compilation bug on real hardware.  This script
runs each kernel on the attached TPU and pins it against the jnp fallback
path computed on the same device.  Run it after a toolchain bump or on new
hardware:

    python tools/tpu_selftest.py          # prints one PASS/FAIL line per check

Exit code 0 iff every check passes.  (On a CPU-only host the kernels run in
interpret mode, which still validates wiring but not Mosaic.)  Each check's
device work is a single jitted program — eager dispatch through a remote
tunnel pays per-primitive compile latency.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}{'  ' + detail if detail else ''}")
    return bool(ok)


def main() -> int:
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    print(f"backend: {jax.default_backend()}  ({jax.devices()[0]})")
    results = []

    # 1) bidirectional chamfer kernel vs dense oracle (oracle on host NumPy)
    from vn_pointcloudcompletion_tpu.ops.chamfer import (
        chamfer_distance,
        chamfer_distance_reference,
    )
    from vn_pointcloudcompletion_tpu.ops.chamfer_pallas_bidir import (
        nn_bidirectional_pallas,
    )

    x = jnp.asarray(rng.standard_normal((2, 1024, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 2048, 3)), jnp.float32)
    d1, i1, d2, i2 = jax.jit(
        lambda a, b: nn_bidirectional_pallas(a, b, interpret=interp))(x, y)
    rd1, rd2, ri1, ri2 = chamfer_distance_reference(np.asarray(x), np.asarray(y))
    results.append(_check(
        "chamfer_bidir_pallas",
        np.allclose(np.asarray(d1), rd1, atol=1e-4)
        and np.allclose(np.asarray(d2), rd2, atol=1e-4)
        and (np.asarray(i1) == ri1).all() and (np.asarray(i2) == ri2).all(),
    ))

    # 2) chamfer VJP (widened scatter / one-hot) vs dense autodiff
    def loss_fast(x, y):
        a, b, _, _ = chamfer_distance(x, y)
        return jnp.mean(a) + jnp.mean(b)

    def loss_dense(x, y):
        diff = x[:, :, None, :] - y[:, None, :, :]
        dist = jnp.sum(diff * diff, axis=-1)
        return jnp.mean(dist.min(axis=2)) + jnp.mean(dist.min(axis=1))

    xs = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((2, 512, 3)), jnp.float32)
    gf, gd = jax.jit(lambda a, b: (
        jax.grad(loss_fast, argnums=(0, 1))(a, b),
        jax.grad(loss_dense, argnums=(0, 1))(a, b)))(xs, ys)
    results.append(_check(
        "chamfer_vjp",
        all(np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
            for a, b in zip(gf, gd)),
    ))

    # 3) fused BN+leaky epilogue vs reference chain
    from vn_pointcloudcompletion_tpu.ops.vn_fused import (
        fused_bn_leaky,
        reference_bn_leaky_planes,
    )

    p = jnp.asarray(rng.standard_normal((2, 3, 128, 1024)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((2, 3, 128, 1024)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(128) * 0.3 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)
    got, want = jax.jit(lambda p, d, a, b: (
        fused_bn_leaky(p, d, a, b, 0.2, interp),
        reference_bn_leaky_planes(p, d, a, b, 0.2)))(p, d, a, b)
    results.append(_check(
        "fused_bn_leaky",
        np.allclose(np.asarray(got), np.asarray(want), atol=2e-5),
    ))

    # 4) whole-layer fused kernel (+ stats) vs dense composition
    from vn_pointcloudcompletion_tpu.ops.vn_layer_fused import (
        EPS,
        vn_layer_fused,
        vn_layer_stats,
    )

    xl = jnp.asarray(rng.standard_normal((2, 3, 32, 4096)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 32)) * 0.2, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((128, 32)) * 0.2, jnp.float32)
    al = jnp.asarray(rng.standard_normal(128) * 0.3 + 1.0, jnp.float32)
    bl = jnp.asarray(rng.standard_normal(128) * 0.1, jnp.float32)

    def layer_both(xl, w, wd, al, bl):
        got = vn_layer_fused(xl, w, wd, None, None, al, bl, 0.2, False, interp)
        pp = jnp.einsum("oc,bjcn->bjon", w, xl)
        dd = jnp.einsum("oc,bjcn->bjon", wd, xl)
        want = reference_bn_leaky_planes(pp, dd, al, bl, 0.2)
        s1, s2 = vn_layer_stats(xl, w, None, False, interp)
        norm = jnp.linalg.norm(pp, axis=1) + EPS
        return got, want, s1, s2, jnp.sum(norm, (0, 2)), jnp.sum(norm * norm, (0, 2))

    got, want, s1, s2, r1, r2 = jax.jit(layer_both)(xl, w, wd, al, bl)
    results.append(_check(
        "vn_layer_fused",
        np.allclose(np.asarray(got), np.asarray(want), atol=3e-5)
        and np.allclose(np.asarray(s1), np.asarray(r1), rtol=2e-5)
        and np.allclose(np.asarray(s2), np.asarray(r2), rtol=2e-5),
    ))

    # 4b) projected layer: fused layer + in-kernel 1-channel contraction
    from vn_pointcloudcompletion_tpu.ops.vn_layer_fused import (
        vn_layer_fused_project,
    )

    wo = jnp.asarray(rng.standard_normal(128) * 0.2, jnp.float32)

    def proj_both(xl, w, wd, al, bl, wo):
        got = vn_layer_fused_project(xl, w, wd, None, None, al, bl, wo,
                                     0.2, False, interp)
        pp = jnp.einsum("oc,bjcn->bjon", w, xl)
        dd = jnp.einsum("oc,bjcn->bjon", wd, xl)
        want = jnp.einsum(
            "c,bjcn->bjn", wo,
            reference_bn_leaky_planes(pp, dd, al, bl, 0.2))[:, :, None]
        return got, want

    got, want = jax.jit(proj_both)(xl, w, wd, al, bl, wo)
    results.append(_check(
        "vn_layer_fused_project",
        np.allclose(np.asarray(got), np.asarray(want), atol=5e-5),
    ))

    # 5) k-smallest kernel vs lax.top_k
    from vn_pointcloudcompletion_tpu.ops.knn_pallas import topk_min_pallas

    dm = jnp.asarray(rng.standard_normal((2, 777, 1500)) ** 2, jnp.float32)
    vals, idx, nd, ri = jax.jit(lambda dm: (
        *topk_min_pallas(dm, 16, interp), *jax.lax.top_k(-dm, 16)))(dm)
    results.append(_check(
        "topk_min_pallas",
        np.allclose(np.asarray(vals), np.asarray(-nd), atol=1e-6)
        and (np.sort(np.asarray(idx), -1) == np.sort(np.asarray(ri), -1)).all(),
    ))

    # 5b) fused distance + k-extraction kernel vs sqdist -> lax.top_k
    from vn_pointcloudcompletion_tpu.ops.knn import pairwise_sqdist
    from vn_pointcloudcompletion_tpu.ops.knn_pallas import knn_min_pallas

    q = jnp.asarray(rng.standard_normal((2, 700, 96)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 1500, 96)), jnp.float32)
    fv, fi, nd2, ri2 = jax.jit(lambda q, r: (
        *knn_min_pallas(q, r, 8, interp),
        *jax.lax.top_k(-pairwise_sqdist(q, r), 8)))(q, r)
    results.append(_check(
        "knn_min_pallas",
        np.allclose(np.asarray(fv), np.asarray(-nd2), atol=1e-3)
        and (np.sort(np.asarray(fi), -1)
             == np.sort(np.asarray(ri2), -1)).all(),
    ))

    # 5c) whole-stage EdgeConv gather kernel vs knn + take + add
    from vn_pointcloudcompletion_tpu.ops.knn_pallas import edge_knn_gather

    xf = jnp.asarray(rng.standard_normal((2, 96, 512)), jnp.float32)
    ue = jnp.asarray(rng.standard_normal((2, 384, 512)), jnp.float32)
    ve = jnp.asarray(rng.standard_normal((2, 384, 512)), jnp.float32)

    def edge_both(xf, ue, ve):
        got = edge_knn_gather(xf, ue, ve, 16, interp)  # (B, C3, K, N)
        _, ei = jax.lax.top_k(
            -pairwise_sqdist(jnp.swapaxes(xf, 1, 2), jnp.swapaxes(xf, 1, 2)),
            16)
        gat = jnp.take_along_axis(
            ue[:, :, None, :], ei.swapaxes(1, 2)[:, None], axis=3)
        return got, gat + ve[:, :, None, :]

    got, want = jax.jit(edge_both)(xf, ue, ve)
    # neighbour SETS must agree (ordering ties differ between extraction
    # and top_k), compared per point via sorted values; the kernel contracts
    # the metric in (D, N) layout vs the fallback's (N, D), so distance LSBs
    # can swap a near-tie neighbour for a tiny fraction of points — require
    # >=99.5% of entries to match instead of all (an all-entries failure is
    # what a real precision bug looks like: the round-5 f32 gather
    # truncation hit 39% of entries)
    ediff = np.abs(np.sort(np.asarray(got), axis=2)
                   - np.sort(np.asarray(want), axis=2))
    results.append(_check(
        "edge_knn_gather", float((ediff > 1e-4).mean()) < 5e-3,
        detail=f"frac>1e-4 = {float((ediff > 1e-4).mean()):.2e}",
    ))

    # 6) FPS kernel vs the jnp greedy loop
    import vn_pointcloudcompletion_tpu.ops.fps_pallas as fp
    from vn_pointcloudcompletion_tpu.ops.fps import furthest_point_sample

    pts = jnp.asarray(rng.standard_normal((4, 1500, 3)), jnp.float32)
    got = jax.jit(lambda p: fp.furthest_point_sample_pallas(
        p, 256, interpret=interp))(pts)
    old = fp.eligible
    try:
        fp.eligible = lambda *a: False
        want = jax.jit(lambda p: furthest_point_sample(p, 256))(pts)
    finally:
        fp.eligible = old
    results.append(_check(
        "fps_pallas", (np.asarray(got) == np.asarray(want)).all()))

    # 7) fused-annealing EMD rounds vs the streamed XLA path
    from vn_pointcloudcompletion_tpu.ops.emd import _emd_blocked_impl
    from vn_pointcloudcompletion_tpu.ops.emd_pallas import emd_rounds_pallas

    e1 = jnp.asarray(rng.standard_normal((2, 1024, 3)), jnp.float32) * 0.2
    e2 = jnp.asarray(rng.standard_normal((2, 1024, 3)), jnp.float32) * 0.2
    os.environ["VN_EMD_FUSED"] = "0"  # pin the fallback inside the jit
    got, want = jax.jit(lambda a, b: (
        emd_rounds_pallas(a, b, interp), _emd_blocked_impl(a, b, 256)))(e1, e2)
    os.environ.pop("VN_EMD_FUSED", None)
    ok = True
    detail = []
    for g, w, nm in zip(got, want, ("cost", "s_n", "t_n", "s_m", "t_m")):
        g, w = np.asarray(g), np.asarray(w)
        scale = max(float(np.abs(w).max()), 1e-6)
        rel = np.abs(g - w) / scale
        # near-tie weight reassignment moves individual per-point t moments
        # by O(0.1) on BOTH valid f32 paths (measured vs the f64 oracle,
        # BASELINE.md round-5) while tie-immune quantities stay tight: gate
        # cost and the s supplies on max, the t moments on mean
        lim_max, lim_mean = (5e-2, None) if nm[0] != "t" else (None, 2e-2)
        this = (rel.max() < lim_max) if lim_max else (rel.mean() < lim_mean)
        ok = ok and this
        detail.append(f"{nm}:{rel.max():.1e}/{rel.mean():.1e}")
    results.append(_check("emd_rounds_pallas", ok,
                          detail="max/mean " + " ".join(detail)))

    print(f"{sum(results)}/{len(results)} kernel checks passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
