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


def _kernel(d_ref, vals_ref, idx_ref, *, k: int, m: int, m_pad: int, kp: int):
    d = d_ref[0].astype(jnp.float32)  # (TN, M_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    if m_pad != m:
        d = jnp.where(col < m, d, _BIG)
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
    vals_ref[0] = vals
    idx_ref[0] = idx


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
