"""Fused bidirectional chamfer: one pass over the distance tiles updates both
directions' minima.

A one-sided predecessor (pruned in round 3) computed the N x M distances
twice — once per direction.  Here each (TN, TM) tile is computed once; row
minima
(x -> y) carry through the in-kernel loop, column minima (y -> x) accumulate
across x-tile programs directly in the VMEM-resident (1, M) output block
(sequential x-tile grid axis — free on a one-TensorCore chip).  ~1.6x fewer
VPU ops than two one-sided passes; exact f32 like the one-sided kernel.

Requires both clouds padded to tile multiples (zero-padded points are masked
in both directions).

Rejected-with-data (round 3): a packed min+argmin variant — truncate the
distance mantissa to 9 bits, OR a 14-bit point index into the low bits, ONE
int32 min-reduce per direction (3 VPU ops vs 4), half the partial-buffer
writes, exact distances recovered by an O(N) gather outside.  Measured on
v5e at 16 x 16384 x 16384 f32: 26.5 ms vs 23.9 ms for this exact kernel —
SLOWER despite ~2.5 fewer VPU ops/element, i.e. the kernel is not
VPU-op-count-bound at TM=4096 (int min/bitcast lanes are no cheaper than the
float cmp+select chain on this VPU).  The fwd floor claim in BASELINE.md is
therefore empirical, not an op-count argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sweep on v5e (16 x 16384 x 16384, f32): (512,1024) 27.4 ms,
# (512,2048) 21.5, (256,4096) 20.4, (512,4096) ~20, (512,8192)/(1024,4096)
# exceed VMEM.  Wide lane tiles amortise the per-tile reduction setup — but
# the masked (non-tile-multiple) variant carries an extra iota+where buffer
# per tile and blows the 16M scoped-VMEM limit at TM=4096, so the column
# tile adapts to the cloud size (hot shapes 16384/2048/1024 all divide 1024).
TN = 512
_TM_CHOICES = (4096, 2048, 1024)


def _tm_for(m: int) -> int:
    for tm in _TM_CHOICES:
        if m % tm == 0:
            return tm
    return _TM_CHOICES[-1]  # small/ragged clouds: pad + mask at 1024
_BIG = 3.0e38  # plain python scalars: jnp constants would be captured tracers
_IMAX = 0x7FFFFFFF


def _bidir_kernel(x_ref, y_ref, nm_ref, rowd_ref, rowi_ref, cold_ref, coli_ref,
                  *, mask_rows: bool, mask_cols: bool, tm: int):
    # x_ref: (1, 3, TN); y_ref: (1, 3, M_pad)
    # mask_rows/mask_cols are compile-time: tile-multiple clouds (the common
    # 2048/16384 sizes) skip the padding masks entirely (~30% fewer VPU ops).
    # The y -> x direction accumulates across x-tiles IN the (1, 1, M_pad)
    # output block: the x-tile grid axis is ARBITRARY (sequential — v5e has
    # one TensorCore, so this costs nothing), the block index is constant
    # along it, and Pallas keeps it VMEM-resident until the last visit.  The
    # (B, NB, M) per-tile partials and their argmin-combine — an XLA variadic
    # reduce that measured 1.4 ms at (8, 28, 14336) and scaled with NB*M —
    # never exist.  Tie semantics match the old combine: strict < keeps the
    # first (lowest row index) match.
    m_pad = y_ref.shape[2]
    num_tiles = m_pad // tm
    n_valid = nm_ref[0]
    m_valid = nm_ref[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        cold_ref[0, 0, 0, :] = jnp.full((m_pad,), _BIG, jnp.float32)
        coli_ref[0, 0, 0, :] = jnp.zeros((m_pad,), jnp.int32)

    x0 = x_ref[0, 0, :].reshape(TN, 1)
    x1 = x_ref[0, 1, :].reshape(TN, 1)
    x2 = x_ref[0, 2, :].reshape(TN, 1)
    if mask_rows:
        row = jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + j * TN
        row_ok = row < n_valid  # (TN, 1)
    # loop-invariant index maps hoisted out of the tile loop (the per-tile
    # iota+add was ~3 of 16 VPU ops/element); `rows` is constant for the
    # whole program, `col` only needs a scalar-offset add per tile
    col0 = jax.lax.broadcasted_iota(jnp.int32, (TN, tm), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (TN, tm), 0) + j * TN

    def body(t, carry):
        best_d, best_i = carry
        y_t0 = y_ref[0, 0, pl.ds(t * tm, tm)].reshape(1, tm)
        y_t1 = y_ref[0, 1, pl.ds(t * tm, tm)].reshape(1, tm)
        y_t2 = y_ref[0, 2, pl.ds(t * tm, tm)].reshape(1, tm)
        d0 = x0 - y_t0
        d1 = x1 - y_t1
        d2 = x2 - y_t2
        dist = d0 * d0 + d1 * d1 + d2 * d2  # (TN, TM)
        col = col0 + t * tm

        # x -> y direction
        dist_r = jnp.where(col < m_valid, dist, _BIG) if mask_cols else dist
        tile_min = jnp.min(dist_r, axis=1)
        tile_arg = jnp.min(jnp.where(dist_r <= tile_min[:, None], col, _IMAX), axis=1)
        take = tile_min < best_d
        best_d = jnp.where(take, tile_min, best_d)
        best_i = jnp.where(take, tile_arg, best_i)

        # y -> x direction: min over this x-tile, accumulated into the
        # VMEM-resident output block
        dist_c = jnp.where(row_ok, dist, _BIG) if mask_rows else dist
        cmin = jnp.min(dist_c, axis=0)  # (TM,)
        carg = jnp.min(jnp.where(dist_c <= cmin[None, :], rows, _IMAX), axis=0)
        prev_d = cold_ref[0, 0, 0, pl.ds(t * tm, tm)]
        prev_i = coli_ref[0, 0, 0, pl.ds(t * tm, tm)]
        ctake = cmin < prev_d
        cold_ref[0, 0, 0, pl.ds(t * tm, tm)] = jnp.where(ctake, cmin, prev_d)
        coli_ref[0, 0, 0, pl.ds(t * tm, tm)] = jnp.where(ctake, carg, prev_i)
        return best_d, best_i

    init = (jnp.full((TN,), _BIG, dtype=jnp.float32),
            jnp.zeros((TN,), dtype=jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_tiles, body, init)
    rowd_ref[0, 0, 0, :] = jnp.maximum(best_d, 0.0)
    rowi_ref[0, 0, 0, :] = best_i


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn_bidirectional_pallas(x: jnp.ndarray, y: jnp.ndarray,
                            interpret: bool = False):
    """Both chamfer directions in one sweep.

    x: (B, N, 3), y: (B, M, 3) ->
    (d_xy (B, N), i_xy (B, N), d_yx (B, M), i_yx (B, M)).
    """
    b, n, _ = x.shape
    m = y.shape[1]
    tm = _tm_for(m)
    n_pad = _pad_to(n, TN)
    m_pad = _pad_to(m, tm)

    xt = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    yt = jnp.swapaxes(y.astype(jnp.float32), 1, 2)
    if n_pad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - n)))
    if m_pad != m:
        yt = jnp.pad(yt, ((0, 0), (0, 0), (0, m_pad - m)))
    nm = jnp.array([n, m], dtype=jnp.int32)

    nb = n_pad // TN
    grid = (b, nb)
    kernel = functools.partial(
        _bidir_kernel, mask_rows=(n_pad != n), mask_cols=(m_pad != m), tm=tm
    )
    rowd, rowi, cold, coli = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TN), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, TN), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, TN), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nb, 1, TN), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 1, TN), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 1, m_pad), jnp.int32),
        ],
        # the x-tile axis accumulates into the column outputs -> sequential
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY),
            # single-y-tile shapes (m_pad == tm, e.g. coarse 448 vs complete
            # 4096) unroll the tile loop and Mosaic's stack accounting
            # charges ~19 MB against the default 16 MB scoped limit; the
            # multi-tile hot shapes fit, so this cap only unblocks the
            # small-cloud eval path
            vmem_limit_bytes=40 << 20,
        ),
        interpret=interpret,
    )(xt, yt, nm)

    d_xy = rowd.reshape(b, n_pad)[:, :n]
    i_xy = rowi.reshape(b, n_pad)[:, :n]
    d_yx = jnp.maximum(cold[:, 0, 0, :m], 0.0)
    i_yx = coli[:, 0, 0, :m]
    return d_xy, i_xy, d_yx, i_yx
