"""Approximate Earth Mover's Distance (Fan's annealed matching).

TPU-native replacement for ``extensions/earth_movers_distance/emd_kernel.cu``
(``approxmatch`` at :26-158, ``matchcost`` at :201-243, grad kernels at
:287-400) and its autograd wrapper ``emd.py:6-43``.

The algorithm is nine annealing rounds (temperature ``level = -4**j`` for
``j = 7..-1`` plus a final ``level = 0`` round) that alternately normalise row
supplies and column capacities of a soft assignment ``match`` (B, M, N).  Every
step is an exp + a matmul against the (N, M) squared-distance matrix — it maps
directly onto the MXU under ``lax.fori_loop``; no kernel needed.

Gradient convention matches the reference exactly: ``match`` is treated as a
constant in the backward pass (``emd.py:17-22`` routes grads through
``matchcostgrad`` only), which here is simply ``stop_gradient`` on the match
followed by autodiff through the differentiable cost contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.ops.knn import pairwise_sqdist


def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Annealed soft assignment. xyz1: (B, N, 3), xyz2: (B, M, 3) -> (B, M, N).

    Row/column capacities follow the CUDA kernel's integer-ratio convention
    (``emd_kernel.cu:29-35``: ``multiR = n / m`` in integer arithmetic).
    """
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0

    d = pairwise_sqdist(xyz1, xyz2)  # (B, N, M)
    # j = 7..-1 -> level = -4^j; final round at level = 0 (emd_kernel.cu:46-50)
    levels = jnp.array(
        [-(4.0 ** j) for j in range(7, -2, -1)] + [0.0], dtype=jnp.float32
    )

    def body(i, carry):
        match, remain_l, remain_r = carry
        w = jnp.exp(levels[i] * d)  # (B, N, M)
        suml = jnp.einsum("bnm,bm->bn", w, remain_r) + 1e-9
        ratio_l = remain_l / suml  # (B, N)
        sumr = jnp.einsum("bnm,bn->bm", w, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r  # (B, M)
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        delta = w * ratio_l[:, :, None] * ratio_r[:, None, :]  # (B, N, M)
        match = match + delta
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(delta, axis=2))
        return match, remain_l, remain_r

    match0 = jnp.zeros((b, n, m), dtype=jnp.float32)
    remain_l0 = jnp.full((b, n), multi_l, dtype=jnp.float32)
    remain_r0 = jnp.full((b, m), multi_r, dtype=jnp.float32)
    match, _, _ = jax.lax.fori_loop(
        0, levels.shape[0], body, (match0, remain_l0, remain_r0)
    )
    # Reference layout is (B, M, N) — match[l, k] (emd_kernel.cu:146,184).
    return match.transpose(0, 2, 1)


def earth_mover_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Approximate EMD cost per batch element, shape (B,).

    ``cost_b = sum_{l,k} match[l,k] * |xyz1_k - xyz2_l|^2`` with ``match``
    held constant under differentiation (reference backward convention).
    """
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    match = jax.lax.stop_gradient(approx_match(xyz1, xyz2))  # (B, M, N)
    d = pairwise_sqdist(xyz1, xyz2)  # (B, N, M) — differentiable
    return jnp.einsum("bmn,bnm->b", match, d)
