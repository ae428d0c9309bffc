"""Chamfer distance: bidirectional nearest-neighbour squared distances.

TPU-native replacement for the reference's CUDA kernels
(``extensions/chamfer_distance/chamfer3D.cu:12-174`` and the vendored copies in
``extensions/ChamferDistancePytorch/chamfer{2,3,5}D``).  One dimension-generic
implementation serves all call sites; the extra index outputs cover the DCD
loss (``extensions/ChamferDistancePytorch/chamfer3D/dist_chamfer_3D.py:67-75``).

Design (TPU-first, not a kernel translation):

- The O(N*M) distance matrix is never materialised in HBM.  The forward pass
  scans over tiles of the second cloud, keeping only a running (min, argmin)
  per query point.  Each tile's distances come from one ``dot_general``
  (the ``|x|^2 + |y|^2 - 2<x,y>`` expansion) which XLA maps onto the MXU.
- A custom VJP makes the backward pass O(N+M) memory: it re-gathers the
  matched points by index and scatters the ``2*g*(x - y_nn)`` contributions,
  mirroring the semantics of the reference's ``NmDistanceGradKernel``
  (atomicAdd scatter) without atomics — scatter-add in XLA is deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Keep per-tile scratch (N * TILE distances) around ~8M f32 elements (32 MB).
_TILE_BUDGET = 8 * 1024 * 1024
_MIN_TILE = 512


def _tile_size(n: int, m: int) -> int:
    tile = max(_MIN_TILE, _TILE_BUDGET // max(n, 1))
    tile = min(tile, m)
    # round up to a multiple that divides the padded M nicely
    return tile


def _nn_one_sided(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each point in ``x`` (N, D): min squared distance to ``y`` (M, D) and argmin.

    Scans over tiles of ``y`` so peak memory is O(N * tile) instead of O(N * M).
    """
    n, d = x.shape
    m = y.shape[0]
    tile = _tile_size(n, m)
    num_tiles = -(-m // tile)
    pad = num_tiles * tile - m
    if pad:
        # Zero-pad, then mask padded columns out of the min below (inf-padding
        # the coordinates would produce NaNs via the quadratic expansion).
        y = jnp.concatenate([y, jnp.zeros((pad, d), dtype=y.dtype)], axis=0)
    y_tiles = y.reshape(num_tiles, tile, d)

    x_sq = jnp.sum(x * x, axis=-1)  # (N,)

    def body(carry, inp):
        best_d, best_i = carry
        tile_idx, y_t = inp
        y_sq = jnp.sum(y_t * y_t, axis=-1)  # (tile,)
        # (N, tile) distances via MXU matmul
        # HIGHEST precision: a bf16 single-pass matmul (the TPU default) can
        # mis-rank near-tied nearest neighbours.
        cross = jax.lax.dot_general(
            x, y_t, (((1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        dist = x_sq[:, None] + y_sq[None, :] - 2.0 * cross
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + tile_idx * tile
        dist = jnp.where(col < m, dist, jnp.inf)
        tile_min = jnp.min(dist, axis=1)
        tile_arg = jnp.argmin(dist, axis=1).astype(jnp.int32) + tile_idx * tile
        take = tile_min < best_d
        best_d = jnp.where(take, tile_min, best_d)
        best_i = jnp.where(take, tile_arg, best_i)
        return (best_d, best_i), None

    init = (
        jnp.full((n,), jnp.inf, dtype=x.dtype),
        jnp.zeros((n,), dtype=jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(num_tiles, dtype=jnp.int32), y_tiles)
    )
    # Clamp tiny negatives from the quadratic expansion.
    best_d = jnp.maximum(best_d, 0.0)
    return best_d, best_i


@jax.custom_vjp
def chamfer_distance(x: jnp.ndarray, y: jnp.ndarray):
    """Bidirectional Chamfer.  ``x``: (B, N, D), ``y``: (B, M, D), any D.

    Returns ``(dist1, dist2, idx1, idx2)`` — squared distances, matching the
    reference wrapper ``dist_chamfer_3D.chamfer_3DDist`` (and
    ``chamfer_distance.py:74-84`` which uses only the first two outputs).
    """
    return _chamfer_fwd_impl(x, y)


def _use_pallas(x, y) -> bool:
    # 3-D clouds on TPU with enough work to amortise the kernel launch
    return (
        jax.default_backend() == "tpu"
        and x.shape[-1] == 3
        and x.shape[1] * y.shape[1] >= 256 * 256
    )


def _chamfer_fwd_impl(x, y):
    # at least f32 (bf16 inputs promote); f64 passes through untouched so
    # the op is usable in float64 parity harnesses
    ct = jnp.promote_types(jnp.result_type(x, y), jnp.float32)
    x = x.astype(ct)
    y = y.astype(ct)
    if _use_pallas(x, y):
        from vn_pointcloudcompletion_tpu.ops.chamfer_pallas_bidir import (
            nn_bidirectional_pallas,
        )

        d1, i1, d2, i2 = nn_bidirectional_pallas(x, y)
    else:
        d1, i1 = jax.vmap(_nn_one_sided)(x, y)
        d2, i2 = jax.vmap(_nn_one_sided)(y, x)
    return d1, d2, i1, i2


def _chamfer_fwd(x, y):
    out = _chamfer_fwd_impl(x, y)
    d1, d2, i1, i2 = out
    return out, (x, y, i1, i2)


# Targets at or under this row count take the one-hot matmul scatter (the
# mask is B x rows x updates in HBM); larger targets use XLA scatter-add.
_ONEHOT_ROWS = 2048
# ... and on the full one-hot mask size: the (B, n_rows, M) f32 mask is
# B*n_rows*M*4 bytes of HBM, so gate its total elements too (~1.2 GB cap;
# flagship coarse bwd 16x1024x16384 = 268M elems stays on the MXU path).
_ONEHOT_MAX_ELEMS = 300_000_000


def _cross_term(idx, g, pts, n_rows):
    """Scatter the cross-direction gradient moments in ONE widened pass.

    The matched-pair term  sum_m [idx_m = n] 2 g_m (x_n - pts_m)  splits into
    ``2 x_n s_n - 2 t_n`` with scalar mass ``s = scatter(g)`` and vector mass
    ``t = scatter(g * pts)``.  Scatter cost on TPU is per-row dominated, so
    scattering the (D+1)-wide ``[g * pts, g]`` costs the same as D-wide — and
    the split removes the matched-point *gather* from this side entirely
    (measured: dense bwd drops a 4 ms (B, 16384, D) gather; coarse bwd's
    scatter-into-1024-rows becomes a 1 ms one-hot MXU matmul).
    Returns ``(t, s)``: (B, n_rows, D) and (B, n_rows, 1).
    """
    u = jnp.concatenate([g[..., None] * pts, g[..., None]], axis=-1)
    mask_elems = idx.shape[0] * n_rows * idx.shape[1]
    if n_rows <= _ONEHOT_ROWS and mask_elems <= _ONEHOT_MAX_ELEMS:
        rows = jnp.arange(n_rows, dtype=idx.dtype)
        acc = jnp.promote_types(u.dtype, jnp.float32)
        onehot = (idx[:, None, :] == rows[None, :, None]).astype(acc)
        s = jnp.einsum(
            "bnm,bmk->bnk", onehot, u, preferred_element_type=acc
        )
    else:
        zeros = jnp.zeros((u.shape[0], n_rows, u.shape[-1]), u.dtype)
        s = jax.vmap(lambda z, i, v: z.at[i].add(v))(zeros, idx, u)
    return s[..., :-1], s[..., -1:]


def _grad_side(g_self, other, g_other, i_self, i_other, self_pts):
    """Gradient w.r.t. one cloud given the other side's table.

    ``d_self = |self - other[i_self]|^2`` and the cross term from the other
    direction's matches ``i_other`` scattered back onto ``self``.

    Rejected-with-data alternative (kernel pruned in round 3 after the
    measurement stood for two rounds): a Pallas sweep computing both the
    gather and the moment scatter as (TN, TMC) masked dots
    measured dense bwd 19.4 ms vs 10.4 ms here —
    the 8-output-lane MXU dots run at ~6% lane utilisation, the same failure
    mode as the rejected MXU cross-term chamfer forward.  XLA's gather plus
    ONE widened scatter stays the fastest known formulation.
    """
    other_nn = jnp.take_along_axis(other, i_self[..., None], axis=1)
    t, s = _cross_term(i_other, g_other, other, self_pts.shape[1])
    return 2.0 * (g_self[..., None] * (self_pts - other_nn)
                  + self_pts * s - t)


def _chamfer_bwd(res, grads):
    x, y, i1, i2 = res
    g1, g2, _, _ = grads
    ct = jnp.promote_types(jnp.result_type(x, y), jnp.float32)
    x = x.astype(ct)
    y = y.astype(ct)

    # d1_n = |x_n - y_{i1_n}|^2  ->  dx_n += 2 g1_n (x_n - y_nn), dy_{i1_n} -= same
    gx = _grad_side(g1, y, g2, i1, i2, x)
    # d2_m = |y_m - x_{i2_m}|^2 — this whole side is dead code under XLA DCE
    # when y carries no gradient (the training case)
    gy = _grad_side(g2, x, g1, i2, i1, y)
    # cotangents must match the primal dtypes (bf16 inputs are supported)
    return gx.astype(res[0].dtype), gy.astype(res[1].dtype)


chamfer_distance.defvjp(_chamfer_fwd, _chamfer_bwd)


def chamfer_distance_reference(x: np.ndarray, y: np.ndarray):
    """Slow, obviously-correct NumPy oracle (full distance matrix).

    Mirrors the reference's vendored pure-torch oracle
    ``extensions/ChamferDistancePytorch/chamfer_python.py:18-39`` — kept next
    to the fast path so an exactness test can pin the two together
    (the reference's own test pattern, ``unit_test.py:14-35``).
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    diff = x[:, :, None, :] - y[:, None, :, :]
    dist = np.sum(diff * diff, axis=-1)  # (B, N, M)
    d1 = dist.min(axis=2)
    d2 = dist.min(axis=1)
    i1 = dist.argmin(axis=2).astype(np.int32)
    i2 = dist.argmin(axis=1).astype(np.int32)
    return d1.astype(np.float32), d2.astype(np.float32), i1, i2
