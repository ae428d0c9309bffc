"""Fused VN BatchNorm-on-norms + leaky-reflect Pallas op with custom VJP.

The hot layers of every VN model are ``VNLinearLeakyReLU``: a channel matmul
followed by norm-BatchNorm and the leaky reflection.  XLA executes the
post-matmul chain as ~8 separate HBM passes over (B, C, 3, N) activations
(norm reduce, stat reduce, scale, dot, d-norm, mask, reflect, blend).  This
op fuses everything after the matmul into ONE read of the packed ``pd``
activation and one write of the output — and the backward pass into one read
of (pd, dout) and one write of (dp, dd) plus tiny per-channel partials.

BatchNorm is folded to per-channel affines on the vector norms:
``norm_bn = A * (|p| + EPS) + B`` with ``A = gamma/sqrt(var+eps)``,
``B = beta - mean * A`` — computed OUTSIDE the kernel (jnp), so the
batch-statistics gradient chain (train mode) flows through ordinary autodiff
via the custom VJP's dA/dB outputs.

Forward math per channel-point vector (p, d):
    norm_e = |p| + EPS
    s      = A + B / norm_e
    q      = p * s
    dot    = <q, d>;  Z = <d, d> + EPS;  r = dot / Z
    out    = q - (1-ns) * [dot < 0] * r * d

Backward (derived, verified against jnp autodiff in tests):
    c1 = (1-ns) * [dot < 0]
    dq = g - (c1 / Z) * <d, g> * d
    dd = -c1 * ( r * g + (<d, g>/Z) * q - (2 r <d, g>/Z) * d )
    dp = s * dq - (B / norm_e^2) * (<dq, p>/|p|) * p
    dA_c = sum <dq, p>;   dB_c = sum <dq, p> / norm_e
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vn_pointcloudcompletion_tpu.nn import vn as _vn_eps  # for EPS

EPS = 1e-6  # models/vn_layers.py:10 — must match nn.vn.EPS

TN = 256  # point tile (the bwd kernel holds ~12 (TC,3,TN) f32 temporaries;
          # 512 overflows the 16MB scoped-VMEM stack)
TC = 128  # channel tile


def reference_bn_leaky(pd, a, b, negative_slope):
    """Pure-jnp reference (also the CPU/odd-shape fallback)."""
    c = pd.shape[1] // 2
    p = pd[:, :c].astype(jnp.float32)
    d = pd[:, c:].astype(jnp.float32)
    norm_e = jnp.linalg.norm(p, axis=2) + EPS  # (B, C, N)
    s = a[None, :, None] + b[None, :, None] / norm_e
    q = p * s[:, :, None, :]
    dot = jnp.sum(q * d, axis=2, keepdims=True)
    dnsq = jnp.sum(d * d, axis=2, keepdims=True)
    mask = (dot >= 0).astype(jnp.float32)
    reflected = q - (dot / (dnsq + EPS)) * d
    out = negative_slope * q + (1 - negative_slope) * (
        mask * q + (1 - mask) * reflected
    )
    return out.astype(pd.dtype)


def _fwd_kernel(ns_ref, nvalid_ref, p_ref, d_ref, a_ref, b_ref, out_ref):
    ns = ns_ref[0]
    p = p_ref[0].astype(jnp.float32)  # (TC, 3, TN)
    d = d_ref[0].astype(jnp.float32)
    a = a_ref[0, :].reshape(TC, 1)
    b = b_ref[0, :].reshape(TC, 1)

    norm_e = jnp.sqrt(jnp.sum(p * p, axis=1)) + EPS  # (TC, TN)
    s = a + b / norm_e
    q = p * s[:, None, :]
    dot = jnp.sum(q * d, axis=1)  # (TC, TN)
    z = jnp.sum(d * d, axis=1) + EPS
    coef = jnp.where(dot >= 0, 0.0, (1.0 - ns) * dot / z)  # (TC, TN)
    out = q - coef[:, None, :] * d
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(ns_ref, nvalid_ref, p_ref, d_ref, a_ref, b_ref, g_ref,
                dp_ref, dd_ref, da_ref, db_ref):
    ns = ns_ref[0]
    n_valid = nvalid_ref[0]
    j = pl.program_id(1)
    p = p_ref[0].astype(jnp.float32)
    d = d_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    a = a_ref[0, :].reshape(TC, 1)
    b = b_ref[0, :].reshape(TC, 1)

    # mask padded points out of everything (they'd pollute the partials)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TN), 1) + j * TN
    valid = (col < n_valid).astype(jnp.float32)  # (1, TN)
    g = g * valid[:, None, :]

    pnorm = jnp.sqrt(jnp.sum(p * p, axis=1))  # (TC, TN)
    norm_e = pnorm + EPS
    s = a + b / norm_e
    q = p * s[:, None, :]
    dot = jnp.sum(q * d, axis=1)
    z = jnp.sum(d * d, axis=1) + EPS
    r = dot / z
    c1 = jnp.where(dot >= 0, 0.0, 1.0 - ns)  # (TC, TN)

    dg = jnp.sum(d * g, axis=1)  # <d, g>
    dq = g - ((c1 * dg / z)[:, None, :]) * d
    dd = -(
        (c1 * r)[:, None, :] * g
        + ((c1 * dg / z)[:, None, :]) * q
        - ((2.0 * c1 * r * dg / z)[:, None, :]) * d
    )

    dqp = jnp.sum(dq * p, axis=1)  # <dq, p>  (TC, TN)
    # dp = s*dq + (dq.p) * ds/dnorm * p/|p|, ds/dnorm = -b/norm_e^2
    inv_pnorm = jnp.where(pnorm > 0, 1.0 / jnp.maximum(pnorm, 1e-30), 0.0)
    coef_p = b * dqp * inv_pnorm / (norm_e * norm_e)  # (TC, TN); b broadcasts
    dp = s[:, None, :] * dq - coef_p[:, None, :] * p

    dp_ref[0] = dp.astype(dp_ref.dtype)
    dd_ref[0] = dd.astype(dd_ref.dtype)
    da_ref[0, 0, 0, :] = jnp.sum(dqp, axis=1)
    db_ref[0, 0, 0, :] = jnp.sum(dqp / norm_e, axis=1)


def _pad_n(x, n_pad):
    if x.shape[3] == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_pad - x.shape[3])))


def _specs(c, n_pad, dtype, b):
    nc = c // TC
    p_spec = pl.BlockSpec((1, TC, 3, TN), lambda i, j, k: (i, k, 0, j),
                          memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((1, TC, 3, TN), lambda i, j, k: (i, nc + k, 0, j),
                          memory_space=pltpu.VMEM)
    ab_spec = pl.BlockSpec((1, TC), lambda i, j, k: (0, k),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, TC, 3, TN), lambda i, j, k: (i, k, 0, j),
                            memory_space=pltpu.VMEM)
    return p_spec, d_spec, ab_spec, out_spec


def eligible(pd) -> bool:
    """Whether the fused kernel supports this shape."""
    if pd.ndim != 4 or pd.shape[2] != 3:
        return False
    c2 = pd.shape[1]
    return c2 % (2 * TC) == 0 and pd.shape[3] >= TN


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_bn_leaky(pd, a, b, negative_slope: float, interpret: bool = False):
    """pd: (B, 2C, 3, N) packed [p | d]; a, b: (C,) -> out (B, C, 3, N)."""
    out, _ = _fused_fwd(pd, a, b, negative_slope, interpret)
    return out


def _fused_fwd(pd, a, b, negative_slope, interpret):
    bsz, c2, _, n = pd.shape
    c = c2 // 2
    n_pad = -(-n // TN) * TN
    pd_p = _pad_n(pd, n_pad)
    p_spec, d_spec, ab_spec, out_spec = _specs(c, n_pad, pd.dtype, bsz)
    grid = (bsz, n_pad // TN, c // TC)
    ns_arr = jnp.full((1,), negative_slope, jnp.float32)
    nv_arr = jnp.full((1,), n, jnp.int32)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            p_spec, d_spec, ab_spec, ab_spec,
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, 3, n_pad), pd.dtype),
        interpret=interpret,
    )(ns_arr, nv_arr, pd_p, pd_p, a.reshape(1, c), b.reshape(1, c))
    return out[:, :, :, :n], (pd, a, b)


def _fused_fwd_vjp(pd, a, b, negative_slope, interpret):
    return _fused_fwd(pd, a, b, negative_slope, interpret)


def _fused_bwd(negative_slope, interpret, res, g):
    pd, a, b = res
    bsz, c2, _, n = pd.shape
    c = c2 // 2
    n_pad = -(-n // TN) * TN
    pd_p = _pad_n(pd, n_pad)
    g_p = _pad_n(g, n_pad)
    p_spec, d_spec, ab_spec, out_spec = _specs(c, n_pad, pd.dtype, bsz)
    nb = n_pad // TN
    grid = (bsz, nb, c // TC)
    ns_arr = jnp.full((1,), negative_slope, jnp.float32)
    nv_arr = jnp.full((1,), n, jnp.int32)
    part_spec = pl.BlockSpec((1, 1, 1, TC), lambda i, j, k: (i, j, 0, k),
                             memory_space=pltpu.VMEM)
    dp, dd, da_part, db_part = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            p_spec, d_spec, ab_spec, ab_spec, out_spec,
        ],
        out_specs=[out_spec, out_spec, part_spec, part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, 3, n_pad), pd.dtype),
            jax.ShapeDtypeStruct((bsz, c, 3, n_pad), pd.dtype),
            jax.ShapeDtypeStruct((bsz, nb, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nb, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(ns_arr, nv_arr, pd_p, pd_p, a.reshape(1, c), b.reshape(1, c), g_p)
    dpd = jnp.concatenate([dp[:, :, :, :n], dd[:, :, :, :n]], axis=1)
    da = jnp.sum(da_part, axis=(0, 1, 2))
    db = jnp.sum(db_part, axis=(0, 1, 2))
    return dpd, da, db


fused_bn_leaky.defvjp(_fused_fwd_vjp, _fused_bwd)
