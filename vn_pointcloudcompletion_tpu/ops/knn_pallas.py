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
# cap on the backward one-hot operand's element count (b * k_chunk * n * n);
# above it the contraction chunks over the k axis (see _ekg_bwd)
_BWD_ONEHOT_MAX = 64 << 20


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


# ---------------------------------------------------------------------------
# Whole-stage EdgeConv gather: kNN + neighbour gather + centre add in ONE
# program — the (B, N, k) index tensor, the (B, N*k, N) one-hot operand and
# the pairwise distances never exist in HBM.
#
# The VN groupers' dynamic-graph stages (models/dgcnn.py::vn_edge_layer)
# decompose into knn -> gather_planes(one-hot einsum) -> add — ~4 XLA ops
# per stage whose intermediates round-trip HBM while each individual op
# underutilises the chip (the round-3 decomposition: ~12 small latency-bound
# ops, no single dominator).  Here each program holds a (TN, M) distance
# tile (cross terms via one MXU dot, HIGHEST — bit-matching knn_min_pallas'
# neighbour selection), extracts the k indices in place, and gathers the
# pre-transformed features with k in-VMEM one-hot matmuls (0/1 x value with
# f32 accumulation is exact in bf16).  Replaces the same reference surface
# as the composition: KNN_CUDA + vn_get_graph_feature
# (models/utils/dgcnn_util.py:46-74, models/pointr/utils/dgcnn_group.py:
# 231-242).
#
# out[b, :, kk, q] = u[b, :, idx[b, q, kk]] + v[b, :, q]   (kk < k)
# where idx = k nearest columns of xflat (ascending, ties -> smallest).
# Gradients flow to u and v only (indices are piecewise constant in the
# features, matching the unfused path where the kNN distances are unused).
# ---------------------------------------------------------------------------


def edge_gather_eligible(n: int, d: int, k: int, c3: int) -> bool:
    # k is the sublane axis of the (C3, k, TN) output block: keep it
    # tile-aligned for both f32 and bf16 (every grouper stage uses k=16).
    # The n*c3 product cap bounds the per-program VMEM footprint (the u
    # block + out block dominate): 512*1536 covers every engaged grouper
    # stage (vn_pointr conv4/5 n=512 c3=384, conv6 n=128 c3=768;
    # vn_dgcnn_fps conv4 c3=384 / conv5 c3=768 at n=512) while keeping the
    # n=2048 corner to c3<=384, far from the Mosaic allocation ceiling the
    # unbounded gate risked at n=2048 x c3=1536.
    return (
        n <= 2048 and d <= _MAX_D and k in (16, 32) and c3 <= 1536
        and n * c3 <= 512 * 1536
    )


def _edge_kernel(xq_ref, xr_ref, u_ref, v_ref, out_ref, idx_ref,
                 *, k, m, m_pad, kp):
    xq = xq_ref[0].astype(jnp.float32)    # (D_pad, TN)
    xr = xr_ref[0].astype(jnp.float32)    # (D_pad, M_pad)
    cross = jax.lax.dot_general(
        xq, xr, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                      # (TN, M_pad)
    q_sq = jnp.sum(xq * xq, axis=0)[:, None]
    r_sq = jnp.sum(xr * xr, axis=0)[None, :]
    dist = q_sq + r_sq - 2.0 * cross
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    if m_pad != m:
        dist = jnp.where(col < m, dist, _BIG)
    _, idx = _extract_k_min(dist, k, kp)  # (TN, kp)
    idx_ref[0] = idx
    u = u_ref[0]                           # (C3p, M_pad)
    v = v_ref[0]                           # (C3p, TN)
    # 0/1 one-hot row-select as an MXU contraction.  bf16 features pass
    # through a DEFAULT (single-pass) product exactly; f32 features need
    # HIGHEST — DEFAULT would silently truncate them to bf16 in the MXU
    # pass (measured on-chip: ~bf16-ulp error on every gathered value),
    # and HIGHEST's 3-way split reproduces all 24 mantissa bits exactly.
    sel_prec = (
        jax.lax.Precision.DEFAULT if u.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    for kk in range(k):
        sel = (col == idx[:, kk:kk + 1]).astype(u.dtype)  # (TN, M_pad)
        g = jax.lax.dot_general(
            u, sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=sel_prec,
        )                                  # (C3p, TN)
        out_ref[0, :, kk, :] = (g.astype(v.dtype) + v).astype(out_ref.dtype)


def _ekg_impl(xflat, u, v, k, interpret):
    b, d, n = xflat.shape
    c3 = u.shape[1]
    tn = min(TN, -(-n // 128) * 128)
    n_pad = -(-n // tn) * tn
    d_pad = -(-d // 128) * 128
    c3_pad = -(-c3 // 16) * 16
    kp = -(-k // 128) * 128
    if n_pad != n or d_pad != d:
        xflat = jnp.pad(xflat, ((0, 0), (0, d_pad - d), (0, n_pad - n)))
    if n_pad != n or c3_pad != c3:
        u = jnp.pad(u, ((0, 0), (0, c3_pad - c3), (0, n_pad - n)))
        v = jnp.pad(v, ((0, 0), (0, c3_pad - c3), (0, n_pad - n)))

    out, idx = pl.pallas_call(
        functools.partial(_edge_kernel, k=k, m=n, m_pad=n_pad, kp=kp),
        grid=(b, n_pad // tn),
        in_specs=[
            pl.BlockSpec((1, d_pad, tn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3_pad, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3_pad, tn), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c3_pad, k, tn), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, kp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c3_pad, k, n_pad), u.dtype),
            jax.ShapeDtypeStruct((b, n_pad, kp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.PARALLEL),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(xflat, xflat, u, v)
    return out[:, :c3, :, :n], idx[:, :n, :k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def edge_knn_gather(xflat: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                    k: int, interpret: bool = False):
    """Fused dynamic-graph EdgeConv gather.

    xflat: (B, D, N) plane-flat features defining the kNN metric (euclidean
    over columns), u: (B, C3, N) pre-transformed neighbour features,
    v: (B, C3, N) centre features -> (B, C3, k, N) with
    ``out[..., kk, q] = u[..., idx[q, kk]] + v[..., q]``.
    """
    out, _ = _ekg_fwd(xflat, u, v, k, interpret)
    return out


def _ekg_fwd(xflat, u, v, k, interpret):
    out, idx = _ekg_impl(xflat, u, v, k, interpret)
    # zero-size probes carry the input shapes/dtypes into the bwd rule
    return out, (idx, jnp.zeros((xflat.shape[1], 0), xflat.dtype),
                 jnp.zeros((0,), u.dtype), jnp.zeros((0,), v.dtype))


def _ekg_bwd(k, interpret, res, ct):
    idx, x_probe, u_probe, v_probe = res
    b, n, _ = idx.shape
    c3 = ct.shape[1]
    ctf = ct.astype(jnp.float32)
    dv = jnp.sum(ctf, axis=2).astype(v_probe.dtype)
    # scatter-add of ct into the selected columns, as a one-hot contraction
    # (a TPU scatter walks rows serially); e = kk*N + q matches the (k, N)
    # minor-dims flatten of ct.  0/1 one-hot in bf16 is exact; accumulation
    # runs f32 on the MXU.  The (B, chunk*N, N) one-hot operand is bounded
    # to ~64M elements by contracting in chunks over the k axis (a single
    # shot at the n=2048 eligibility corner would be ~537M elements / >1 GB
    # of HBM); every engaged grouper stage (n <= 512) stays single-shot.
    idx_t = jnp.swapaxes(idx, 1, 2)                     # (B, k, N)
    cols = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    k_chunk = max(1, min(k, _BWD_ONEHOT_MAX // max(1, b * n * n)))

    # bf16-feature models lose nothing in a DEFAULT (single-pass) product —
    # their cotangents round-trip bf16 exactly; f32 models need HIGHEST or
    # the MXU pass truncates the f32 cotangents to bf16 (same hazard as the
    # forward gather, see _edge_kernel)
    oh_prec = (
        jax.lax.Precision.DEFAULT if u_probe.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def oh_contract(idx_part, ct_part, kc):
        oh = (idx_part.reshape(b, kc * n)[:, :, None] == cols).astype(
            jnp.bfloat16
        )
        return jnp.einsum(
            "bem,bce->bcm", oh, ct_part.reshape(b, c3, kc * n),
            preferred_element_type=jnp.float32,
            precision=oh_prec,
        )

    if k_chunk >= k:
        du_f32 = oh_contract(idx_t, ctf.reshape(b, c3, k, n), k)
    else:
        ct_kn = ctf.reshape(b, c3, k, n)
        du_f32 = sum(
            oh_contract(
                idx_t[:, k0:k0 + min(k_chunk, k - k0)],
                ct_kn[:, :, k0:k0 + min(k_chunk, k - k0)],
                min(k_chunk, k - k0),
            )
            for k0 in range(0, k, k_chunk)
        )
    du = du_f32.astype(u_probe.dtype)
    # indices are piecewise constant in xflat: zero cotangent
    dx = jnp.zeros((b, x_probe.shape[0], n), x_probe.dtype)
    return dx, du, dv


edge_knn_gather.defvjp(_ekg_fwd, _ekg_bwd)
