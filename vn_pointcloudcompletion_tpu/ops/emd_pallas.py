"""Fused annealed-matching (approx-EMD) rounds in one Pallas program.

TPU-native replacement for the streamed XLA path of
``ops/emd.py::_emd_blocked_impl`` (itself the rebuild of the reference CUDA
``approxmatch``/``matchcost`` kernels, ``emd_kernel.cu:26-243``): identical
round structure — ten annealing rounds (levels ``-4^7 .. -4^0, 0``) of
row-ratio, column-consumption, and cost/moment passes over the implicit
(N, M) match matrix — but every exp-weight tile lives and dies in VMEM.

Why: the XLA path's ``lax.map`` stages materialise each round's three
(block, M) weight matrices through HBM (~30 GB of use-once f32 traffic per
16384-point cloud; BASELINE.md round-4 roofline puts the streamed kernel at
~2.7x its composite floor).  Here the weights are regenerated from the point
lists on the MXU inside the kernel, so HBM traffic drops to the point lists
and the O(N + M) state.

Two measured design decisions shape the kernel (BASELINE.md round-5):

1. **One distance orientation only.**  A first cut computed the column pass
   from transposed (M-query) distance tiles; the annealing algorithm needs
   ``d(x1, x2)[i, j] == d(x2, x1)[j, i]`` to the last bit (``exp(-4^7 * d)``
   amplifies a 1-ulp orientation skew to ~1e-2 relative weight error —
   measured 260x worse match moments vs the f64 oracle), which handcuffs the
   distance matmul to a bitwise-symmetric accumulation.  Instead the column
   sums are accumulated from the SAME row-orientation tiles the row passes
   use (``z += v4_tile . w_tile`` over row tiles): transpose consistency
   becomes structural, and the matmul precision is freed.

2. **bf16 three-way split instead of HIGHEST.**  On-chip probe: the kernel
   runs 71.5 ms/cloud with the f32 HIGHEST (6-pass) distance matmul and
   18.7 ms with a single bf16 pass — the exp evaluations are fully
   overlapped (noexp probe: -0.1 ms).  A single-pass bf16 matmul of
   f32-rounded inputs shifts distances by ~4e-4, and a 2-way hi/lo split
   still leaves x*2^-16 ~ 2e-5 residuals — both fatal at level -4^7.  So
   each operand value is split three ways (``hi = bf16(x)``,
   ``mid = bf16(x - hi)``, ``lo = bf16(x - hi - mid)`` — ~24 mantissa
   bits) and the product expanded to the six >=2^-16 terms
   (hi.hi + hi.mid + mid.hi + mid.mid + hi.lo + lo.hi) laid out as K-rows
   of ONE MXU pass — exactly the term set of XLA's 6-pass BF16_6X, but
   K-stacked (the MXU pipelines the K dimension; six separate passes each
   re-stream the output tiles).  Dropped terms are <= x*y*2^-24 (~2e-8,
   f32-grade); every kept product is exact in the f32 accumulator.

The distance tile is one K=24 MXU contraction of two packed operands:

  query-form q(x1) = [sqh, sqm, sql, mask, mask, mask,
                      -2h, -2h, -2m, -2m, -2h, -2l]   (xyz triples)
  ref-form   r(x2) = [mask, mask, mask, sqh, sqm, sql,
                        h,   m,   h,   m,   l,   h]   (xyz triples)

(measured: K=24 runs at the same rate as K=32 with zero-pad rows, and tile
height TR in {128, 256, 512} is flat at ~49 ms/cloud — the kernel is
MXU-pass-bound, so the 24 live rows are kept unpadded)

  d[i, j] = |q_i|^2 + |r_j|^2 - 2 q_i.r_j   (+ O(2e-8) dropped terms;
  sqh/sqm/sql are the 3-way split of the f32 squared norms)

(mask rows are 1 on real points, 0 on padding — padded entries then ride the
same zero-supply/zero-capacity masking as the XLA path).  All per-point
state (remains, ratios, the widened v4/u4 moment operands and the s/t match
moments of the custom VJP) is carried as (rows, length) row-major vectors in
VMEM scratch across a (B, rounds) grid; every reduction that produces a
row-layout vector runs as a thin MXU contraction, and no (length, 1) column
relayouts exist anywhere.  Two further measured cuts: next round's supply
sums are computed during pass C from the same distance tiles (the C+A
merge: 30 -> 21 distance matmuls, 49.0 -> 46.3 ms/cloud), and the thin
ratio-sum dots run as three exact single-pass bf16 products of 2-way-split
operands instead of HIGHEST (``thin_dot`` below: 46.3 -> 30.9 ms/cloud —
the 6-pass HIGHEST thin dots were re-streaming the 16 MB weight tile and
cost 29 ms of the 46).  The 2^-16 thin-dot operand grade costs per-point
t-moment accuracy on CPU oracles (~2e-3 rel at 256 pts vs ~5e-6 with
HIGHEST, annealing feedback amplifies it ~25x) but is invisible on-chip,
where tie-reassignment noise dominates both paths (measured: identical
cost/t deviations vs the streamed path before and after the change);
supplies and cost stay tight.

The public entry returns exactly ``_emd_blocked_impl``'s tuple
``(cost, s_n, t_n, s_m, t_m)`` and is dispatched from there — the trainable
custom VJP of ``earth_mover_distance_blocked`` (match-constant gradients,
reference ``emd.py:17-22``) is untouched.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 256        # rows per distance tile: the (TR, M_pad) f32 tile is VMEM-resident
_MAX_PTS = 16384


def fused_enabled() -> bool:
    """``VN_EMD_FUSED`` ∈ {1, 0, auto}; auto engages on TPU only (=1
    elsewhere runs the kernel in interpret mode, for tests)."""
    mode = os.environ.get("VN_EMD_FUSED", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    return jax.default_backend() == "tpu"


def fused_eligible(n: int, m: int) -> bool:
    # below ~1M matrix entries the XLA path's HBM traffic is irrelevant and
    # per-call kernel overhead dominates; above 16384 the (TR, M_pad) tile
    # would outgrow the VMEM budget
    return n <= _MAX_PTS and m <= _MAX_PTS and n * m >= 1 << 20


def _split3(x):
    hi = x.astype(jnp.bfloat16)
    rem = x - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _pack(x, length, n_valid):
    """(B, n, 3) f32 -> (q24 bf16, r24 bf16, a4 f32), each (B, rows, length).

    q24/r24 are the 24-row split operands of the distance contraction
    (see module docstring); ``a4 = [mask, x, y, z]``
    carries the exact f32 mask/coordinates for the supply initialisation
    and the v4/u4 moment operands.
    """
    b = x.shape[0]
    xp = jnp.zeros((b, length, 3), jnp.float32).at[:, : x.shape[1]].set(x)
    sq = jnp.sum(xp * xp, axis=2)                      # (B, L)
    mask = jnp.broadcast_to(
        (jnp.arange(length) < n_valid).astype(jnp.float32)[None], sq.shape
    )
    xt = xp.transpose(0, 2, 1)                         # (B, 3, L)
    sqh, sqm, sql = (s[:, None] for s in _split3(sq))  # (B, 1, L) each
    h, m, lo = _split3(xt)                             # (B, 3, L) each
    mk = mask.astype(jnp.bfloat16)[:, None]
    q24 = jnp.concatenate(
        [sqh, sqm, sql, mk, mk, mk,
         -2.0 * h, -2.0 * h, -2.0 * m, -2.0 * m, -2.0 * h, -2.0 * lo],
        axis=1)
    r24 = jnp.concatenate(
        [mk, mk, mk, sqh, sqm, sql, h, m, h, m, lo, h], axis=1)
    a4 = jnp.concatenate([mask[:, None], xt], axis=1)
    return q24, r24, a4


def _kernel(levels_ref, x1q_ref, x2r_ref, x1a_ref, x2a_ref,
            cost_ref, accn_ref, accm_ref,
            remain_l, remain_r, ratio_l, ratio_r_s, suml_s, costrow_s,
            v4_s, u4_s, z_s, y_s, accn_s, accm_s, cost_s,
            *, n_pad, m_pad, multi_l, multi_r, n_rounds):
    r = pl.program_id(1)
    level = levels_ref[r]
    x2r = x2r_ref[0]                                    # (24, M_pad) bf16
    x1a = x1a_ref[0]                                    # (4, N_pad) f32
    x2a = x2a_ref[0]                                    # (4, M_pad) f32

    @pl.when(r == 0)
    def _init():
        remain_l[:] = multi_l * x1a[0:1, :]             # mask row
        remain_r[:] = multi_r * x2a[0:1, :]
        accn_s[:] = jnp.zeros_like(accn_s)
        accm_s[:] = jnp.zeros_like(accm_s)
        cost_s[0, 0] = 0.0

    def w_tile(off):
        """exp(level * d) for rows [off, off+TR) — ALWAYS x1-rows x x2-cols
        (single orientation; see module docstring), one bf16 MXU pass."""
        q = x1q_ref[0, :, pl.ds(off, _TR)]              # (24, TR) bf16
        d = jax.lax.dot_general(
            q, x2r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (TR, M_pad) f32
        d = jnp.maximum(d, 0.0)
        return jnp.exp(level * d), d

    def _split2(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def thin_dot(vec, mat, dims):
        # f32 x f32 contraction as THREE exact bf16 single-pass dots.
        # Mosaic offers only DEFAULT (one bf16 pass: rounds f32
        # operands to 2^-8 — visibly shifts the ratio sums) and
        # HIGHEST (6 passes: measured 29 ms/cloud of the kernel's 46 —
        # each pass re-streams the 16 MB weight tile).  A manual 2-way
        # split of BOTH operands needs only the three >=2^-16 product
        # terms (vh.mh + vh.ml + vl.mh, each exact in the f32
        # accumulator; dropped vl.ml <= 2^-32) — f32-grade sums at
        # half the HIGHEST cost.
        vh, vl = _split2(vec)
        mh, ml = _split2(mat)

        def dd(a, b):
            return jax.lax.dot_general(
                a, b, dims, preferred_element_type=jnp.float32)

        return dd(vh, mh) + dd(vh, ml) + dd(vl, mh)

    def rowvec_dot(vec, mat):
        # (rows, K) x (TR, K) -> (rows, TR): reductions land in row layout
        return thin_dot(vec, mat, (((1,), (1,)), ((), ())))

    # ---- pass A: row supply sums --------------------------------------
    # only the FIRST round pays a dedicated pass: rounds r >= 1 find their
    # suml already in scratch, computed by round r-1's pass C from the same
    # distance tiles (the C+A merge — saves 10 of 30 distance matmuls;
    # identical math: suml(r) needs remain_r after round r-1's pass-B
    # epilogue, which has already run when pass C executes)
    @pl.when(r == 0)
    def _pass_a():
        def pass_a(i, _):
            off = pl.multiple_of(i * _TR, _TR)
            w, _ = w_tile(off)
            suml_s[0:1, pl.ds(off, _TR)] = rowvec_dot(remain_r[:], w)
            return 0

        jax.lax.fori_loop(0, n_pad // _TR, pass_a, 0)

    ratio_l[:] = remain_l[:] / (suml_s[:] + 1e-9)
    v4_s[:] = x1a * ratio_l[:]                          # [rl, rl*x, rl*y, rl*z]

    # ---- pass B: column consumption + column moments ------------------
    # z[j, c] = sum_q v4[j, q] * w[q, c], accumulated over the SAME
    # row-orientation tiles pass A used — no transposed distances exist
    z_s[:] = jnp.zeros_like(z_s)

    def pass_b(i, _):
        off = pl.multiple_of(i * _TR, _TR)
        w, _ = w_tile(off)
        v4t = v4_s[:, pl.ds(off, _TR)]                  # (4, TR)
        z_s[:] = z_s[:] + thin_dot(v4t, w, (((1,), (0,)), ((), ())))
        return 0

    jax.lax.fori_loop(0, n_pad // _TR, pass_b, 0)
    rr = remain_r[:]
    sumr = z_s[0:1, :] * rr
    consumption = jnp.minimum(rr / (sumr + 1e-9), 1.0)
    ratio_r = consumption * rr
    ratio_r_s[:] = ratio_r
    remain_r[:] = jnp.maximum(0.0, rr - sumr)
    accm_s[:] = accm_s[:] + ratio_r * z_s[:]            # s_m row 0, t_m rows 1:4
    u4_s[:] = x2a * ratio_r

    # ---- pass C: row moments + cost (+ next round's pass A) -----------
    lvl_next = levels_ref[jnp.minimum(r + 1, n_rounds - 1)]
    is_last = r == n_rounds - 1

    def pass_c(i, _):
        off = pl.multiple_of(i * _TR, _TR)
        w, d = w_tile(off)
        y_s[:, pl.ds(off, _TR)] = rowvec_dot(u4_s[:], w)
        costrow_s[0:1, pl.ds(off, _TR)] = rowvec_dot(ratio_r_s[:], w * d)

        # C+A merge: next round's supply sums from the same distance tile
        # (remain_r already holds its post-round-r value — pass-B epilogue
        # ran above; the exp is free, the saved matmul is not)
        @pl.when(jnp.logical_not(is_last))
        def _():
            wn = jnp.exp(lvl_next * d)
            suml_s[0:1, pl.ds(off, _TR)] = rowvec_dot(remain_r[:], wn)

        return 0

    jax.lax.fori_loop(0, n_pad // _TR, pass_c, 0)
    rl = ratio_l[:]
    cost_s[0, 0] = cost_s[0, 0] + jnp.sum(rl * costrow_s[:])
    accn_s[:] = accn_s[:] + rl * y_s[:]                 # s_n row 0, t_n rows 1:4
    remain_l[:] = jnp.maximum(0.0, remain_l[:] - rl * y_s[0:1, :])

    @pl.when(r == n_rounds - 1)
    def _emit():
        cost_ref[0] = jnp.full((1, 128), cost_s[0, 0], jnp.float32)
        accn_ref[0] = accn_s[:]
        accm_ref[0] = accm_s[:]


def emd_rounds_pallas(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                      interpret: bool = False):
    """Fused-annealing EMD forward.  xyz1 (B, N, 3), xyz2 (B, M, 3) f32 ->
    ``(cost (B,), s_n (B, N), t_n (B, N, 3), s_m (B, M), t_m (B, M, 3))`` —
    the exact ``_emd_blocked_impl`` contract (same masking, epsilons, and
    integer-ratio capacities as ``emd_kernel.cu:29-35``)."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if n >= m:
        multi_l, multi_r = 1.0, float(n // m)
    else:
        multi_l, multi_r = float(m // n), 1.0
    n_pad = -(-n // _TR) * _TR
    m_pad = -(-m // 128) * 128
    x1q, _, x1a = _pack(xyz1.astype(jnp.float32), n_pad, n)
    _, x2r, x2a = _pack(xyz2.astype(jnp.float32), m_pad, m)
    levels = jnp.array(
        [-(4.0 ** j) for j in range(7, -2, -1)] + [0.0], dtype=jnp.float32
    )
    n_rounds = levels.shape[0]

    cost, accn, accm = pl.pallas_call(
        functools.partial(
            _kernel, n_pad=n_pad, m_pad=m_pad,
            multi_l=multi_l, multi_r=multi_r, n_rounds=n_rounds,
        ),
        grid=(b, n_rounds),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 24, n_pad), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 24, m_pad), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_pad), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, m_pad), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_pad), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, m_pad), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 4, m_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, n_pad), jnp.float32),   # remain_l
            pltpu.VMEM((1, m_pad), jnp.float32),   # remain_r
            pltpu.VMEM((1, n_pad), jnp.float32),   # ratio_l
            pltpu.VMEM((1, m_pad), jnp.float32),   # ratio_r
            pltpu.VMEM((1, n_pad), jnp.float32),   # suml
            pltpu.VMEM((1, n_pad), jnp.float32),   # cost row
            pltpu.VMEM((4, n_pad), jnp.float32),   # v4
            pltpu.VMEM((4, m_pad), jnp.float32),   # u4
            pltpu.VMEM((4, m_pad), jnp.float32),   # z
            pltpu.VMEM((4, n_pad), jnp.float32),   # y
            pltpu.VMEM((4, n_pad), jnp.float32),   # acc_n
            pltpu.VMEM((4, m_pad), jnp.float32),   # acc_m
            pltpu.SMEM((1, 1), jnp.float32),       # cost accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(levels, x1q, x2r, x1a, x2a)

    return (
        cost[:, 0, 0],
        accn[:, 0, :n],
        accn[:, 1:4, :n].transpose(0, 2, 1),
        accm[:, 0, :m],
        accm[:, 1:4, :m].transpose(0, 2, 1),
    )
