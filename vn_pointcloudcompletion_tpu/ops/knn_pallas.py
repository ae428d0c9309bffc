"""VMEM-resident k-smallest extraction for kNN (replaces ``lax.top_k``).

``lax.top_k`` over a (B, N, M) distance matrix lowers to a sort-based
reduction that reads/writes the matrix through HBM repeatedly — measured
15 ms for (8, 2048, 2048) k=16 on v5e, and an iterative jnp extraction is
no better (11.4 ms) because the carried matrix round-trips HBM per pass.
Here each row tile stays in VMEM and the k extraction passes (min, exact
argmin via the index-select trick, mask-out) are pure VPU work:
~6 ops/element/pass, one HBM read of the matrix total.

Exact semantics: returns the k smallest entries ascending with their
indices; ties resolve to the smallest index (deterministic).  Used by
``ops/knn.py::knn`` — both the coordinate kNN (chamfer-style pairwise
distances) and DGCNN's dynamic feature-space graphs (matmul distances)
share it, replacing the reference's ``KNN_CUDA`` wheel
(``models/dgcnn.py:11``) and torch ``topk`` fallback
(``models/utils/dgcnn_util.py:11-17``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 256          # rows per program
_MAX_M = 4096     # row length cap: the (TN, M) tile must stay VMEM-resident
_BIG = 3.0e38


def eligible(m: int, k: int) -> bool:
    return m <= _MAX_M and k <= 64


def _extract_k_min(d, k: int, kp: int):
    """k smallest entries (ascending, ties -> smallest index) of each row.

    d: (TN, M_pad) in VMEM, already masked.  Returns ((TN, kp), (TN, kp)).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (d.shape[0], kp), 1)

    def body(i, carry):
        d, vals, idx = carry
        mn = jnp.min(d, axis=1)
        arg = jnp.min(
            jnp.where(d <= mn[:, None], col, jnp.int32(0x7FFFFFFF)), axis=1
        )
        # dynamic lane stores are not supported; accumulate via lane select
        vals = jnp.where(lane == i, mn[:, None], vals)
        idx = jnp.where(lane == i, arg[:, None], idx)
        d = jnp.where(col == arg[:, None], _BIG, d)
        return d, vals, idx

    _, vals, idx = jax.lax.fori_loop(
        0, k, body,
        (d, jnp.zeros((d.shape[0], kp), jnp.float32),
         jnp.zeros((d.shape[0], kp), jnp.int32)),
    )
    return vals, idx


def _kernel(d_ref, vals_ref, idx_ref, *, k: int, m: int, m_pad: int, kp: int):
    d = d_ref[0].astype(jnp.float32)  # (TN, M_pad)
    if m_pad != m:
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d = jnp.where(col < m, d, _BIG)
    vals_ref[0], idx_ref[0] = _extract_k_min(d, k, kp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def topk_min_pallas(d: jnp.ndarray, k: int, interpret: bool = False):
    """k smallest per row, ascending. d: (B, N, M) -> ((B, N, k), (B, N, k)).

    Differentiable in the values (the cotangent scatters back to the
    selected entries, matching ``lax.top_k``'s gradient); indices are
    integer outputs.
    """
    out, _ = _topk_fwd(d, k, interpret)
    return out


def _topk_fwd(d, k, interpret):
    out = _topk_impl(d, k, interpret)
    # residuals must be arrays: a 0-byte (M, 0) array carries M + the dtype
    return out, (out[1], jnp.zeros((d.shape[2], 0), d.dtype))


def _topk_bwd(k, interpret, res, cts):
    idx, m_probe = res
    dvals, _ = cts
    b, n, _ = idx.shape
    zeros = jnp.zeros((b, n, m_probe.shape[0]), jnp.float32)
    dd = jax.vmap(lambda z, i, v: z.at[
        jnp.arange(n)[:, None], i].add(v))(zeros, idx, dvals)
    return (dd.astype(m_probe.dtype),)


def _topk_impl(d: jnp.ndarray, k: int, interpret: bool = False):
    b, n, m = d.shape
    n_pad = -(-n // TN) * TN
    m_pad = -(-m // 128) * 128
    if n_pad != n or m_pad != m:
        d = jnp.pad(d, ((0, 0), (0, n_pad - n), (0, m_pad - m)))
    kp = -(-k // 128) * 128  # lane-pad the k outputs

    vals, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, m=m, m_pad=m_pad, kp=kp),
        grid=(b, n_pad // TN),
        in_specs=[pl.BlockSpec((1, TN, m_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, TN, kp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, kp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, kp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.PARALLEL)),
        interpret=interpret,
    )(d)
    return vals[:, :n, :k], idx[:, :n, :k]


topk_min_pallas.defvjp(_topk_fwd, _topk_bwd)


# ---------------------------------------------------------------------------
# Fused distance + k-extraction: the (B, N, M) matrix never exists in HBM.
#
# The unfused path materialises pairwise distances (matmul + norm epilogue,
# one HBM write) and re-reads them in the extraction kernel — ~3 full passes
# of a matrix that is consumed once.  At the groupers' sizes the matmul is
# trivially small (D <= ~200, K-starved on the MXU), so the round trips ARE
# the cost.  Here each program holds a (TN, M) tile: cross terms via one
# in-VMEM dot against the (D, M)-transposed reference, norms recomputed in
# register, extraction in place.  Replaces the same reference surface as
# ``topk_min_pallas`` (KNN_CUDA / dgcnn_util.knn).
# ---------------------------------------------------------------------------

_MAX_D = 512


def fused_eligible(m: int, k: int, d: int) -> bool:
    return m <= _MAX_M and k <= 64 and d <= _MAX_D


def _fused_kernel(q_ref, rt_ref, vals_ref, idx_ref, *, k, m, m_pad, kp):
    q = q_ref[0].astype(jnp.float32)      # (TN, D_pad)
    rt = rt_ref[0].astype(jnp.float32)    # (D_pad, M_pad)
    # HIGHEST matches the f32 matmul of the unfused path: the MXU's default
    # single-pass bf16 product shifts distances by ~1e-1 and reorders ties
    cross = jnp.dot(q, rt, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(rt * rt, axis=0, keepdims=True)
    d = q_sq + r_sq - 2.0 * cross
    if m_pad != m:
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d = jnp.where(col < m, d, _BIG)
    vals_ref[0], idx_ref[0] = _extract_k_min(d, k, kp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def knn_min_pallas(q: jnp.ndarray, r: jnp.ndarray, k: int,
                   interpret: bool = False):
    """k nearest neighbours, distances computed in-kernel.

    q: (B, N, D), r: (B, M, D) -> ((B, N, k) sq-distances ascending,
    (B, N, k) int32 indices).  Differentiable in the distances w.r.t. both
    point sets (same cotangent flow as ``sq_dist -> top_k``); ties resolve
    to the smallest index.
    """
    out, _ = _knn_fwd(q, r, k, interpret)
    return out


def _knn_impl(q, r, k, interpret):
    b, n, d = q.shape
    m = r.shape[1]
    n_pad = -(-n // TN) * TN
    m_pad = -(-m // 128) * 128
    d_pad = -(-d // 128) * 128
    if n_pad != n or d_pad != d:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    rt = jnp.transpose(r, (0, 2, 1))
    if m_pad != m or d_pad != d:
        rt = jnp.pad(rt, ((0, 0), (0, d_pad - d), (0, m_pad - m)))
    kp = -(-k // 128) * 128

    vals, idx = pl.pallas_call(
        functools.partial(_fused_kernel, k=k, m=m, m_pad=m_pad, kp=kp),
        grid=(b, n_pad // TN),
        in_specs=[
            pl.BlockSpec((1, TN, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TN, kp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN, kp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, kp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.PARALLEL),
            vmem_limit_bytes=64 << 20,
        ),
        interpret=interpret,
    )(q, rt)
    return vals[:, :n, :k], idx[:, :n, :k]


def _knn_fwd(q, r, k, interpret):
    out = _knn_impl(q, r, k, interpret)
    return out, (q, r, out[1])


def _knn_bwd(k, interpret, res, cts):
    q, r, idx = res
    dvals, _ = cts
    g = dvals.astype(jnp.float32)                       # (B, N, K)
    from vn_pointcloudcompletion_tpu.ops.knn import gather_neighbors

    qf = q.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    r_nn = gather_neighbors(rf, idx)                    # (B, N, K, D)
    diff = qf[:, :, None, :] - r_nn                     # q_n - r_{idx}
    dq = 2.0 * jnp.sum(g[..., None] * diff, axis=2)
    b, n, kk = idx.shape
    m = r.shape[1]
    contrib = (-2.0 * g[..., None] * diff).reshape(b, n * kk, -1)
    dr = jax.vmap(
        lambda z, i, v: z.at[i].add(v)
    )(jnp.zeros((b, m, r.shape[2]), jnp.float32), idx.reshape(b, n * kk),
      contrib)
    return dq.astype(q.dtype), dr.astype(r.dtype)


knn_min_pallas.defvjp(_knn_fwd, _knn_bwd)
