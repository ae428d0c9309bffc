"""Fused VN BatchNorm-on-norms + leaky-reflect Pallas op (plane layout).

The hot layers of every VN model are ``VNLinearLeakyReLU``: a channel matmul
followed by norm-BatchNorm and the leaky reflection.  XLA executes the
post-matmul chain as multiple HBM passes; this op fuses it into one read of
(p, d) and one write of the output (2.9x faster than the XLA chain on v5e),
and the backward into one read of (p, d, g) and one write of (dp, dd) plus
tiny per-channel partials.

Layout is the key: tensors are **coordinate planes** (B, 3, C, N) so every
Pallas block is an aligned (TC, TN) tile — the naive (B, C, 3, N) layout
forces 3->8/16 sublane padding inside kernels and loses to XLA.  The channel
matmul produces planes for free (``oc,bcjn->bjon``), so whole VN chains run
in plane layout with transposes only at tiny boundaries.

BatchNorm is folded to per-channel affines on the vector norms:
``norm_bn = A * (|p| + EPS) + B`` — A, B computed OUTSIDE (jnp), so the
train-mode batch-statistics gradient chain flows through ordinary autodiff
via this op's dA/dB cotangents.

Forward math per channel-point vector (p, d):
    norm_e = |p| + EPS;  s = A + B / norm_e;  q = p * s
    dot = <q, d>;  Z = <d, d> + EPS;  r = dot / Z
    out = q - (1-ns) * [dot < 0] * r * d

Backward (verified against jnp autodiff in tests):
    c1 = (1-ns) * [dot < 0]
    dq = g - (c1 / Z) * <d, g> * d
    dd = -c1 * ( r * g + (<d, g>/Z) * q - (2 r <d, g>/Z) * d )
    dp = s * dq - (B / norm_e^2) * (<dq, p>/|p|) * p
    dA_c = sum <dq, p>;   dB_c = sum <dq, p> / norm_e
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6  # models/vn_layers.py:10 — must match nn.vn.EPS

TN = 512  # point tile


def _tc_for(c: int) -> int:
    """Channel tile: full C for thin layers (sublane-aligned), else 128."""
    if c % 128 == 0:
        return 128
    if c <= 128 and c % 16 == 0:
        return c
    return 0  # ineligible


def reference_bn_leaky_planes(p, d, a, b, negative_slope):
    """Pure-jnp reference on (B, 3, C, N) planes (also the fallback path)."""
    # the zero-norm subgradient convention lives in ONE place (nn.vn.safe_norm
    # == the inv_pnorm guard in _bwd_kernel below); imported here rather than
    # re-implemented so the copies can't drift (local import: nn imports ops)
    from vn_pointcloudcompletion_tpu.nn.vn import safe_norm

    ct = jnp.promote_types(p.dtype, jnp.float32)  # f64 passes through
    p32 = p.astype(ct)
    d32 = d.astype(ct)
    norm_e = safe_norm(p32, axis=1) + EPS
    s = (a[None, :, None] + b[None, :, None] / norm_e)[:, None]
    q = p32 * s
    dot = jnp.sum(q * d32, axis=1, keepdims=True)
    z = jnp.sum(d32 * d32, axis=1, keepdims=True) + EPS
    coef = jnp.where(dot >= 0, 0.0, (1 - negative_slope) * dot / z)
    return (q - coef * d32).astype(p.dtype)


def _fwd_kernel(ns_ref, p_ref, d_ref, a_ref, b_ref, out_ref, *, tc):
    ns = ns_ref[0]
    p0 = p_ref[0, 0].astype(jnp.float32)
    p1 = p_ref[0, 1].astype(jnp.float32)
    p2 = p_ref[0, 2].astype(jnp.float32)
    d0 = d_ref[0, 0].astype(jnp.float32)
    d1 = d_ref[0, 1].astype(jnp.float32)
    d2 = d_ref[0, 2].astype(jnp.float32)
    a = a_ref[0, :].reshape(tc, 1)
    b = b_ref[0, :].reshape(tc, 1)

    norm_e = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2) + EPS  # (TC, TN)
    s = a + b / norm_e
    q0, q1, q2 = p0 * s, p1 * s, p2 * s
    dot = q0 * d0 + q1 * d1 + q2 * d2
    z = d0 * d0 + d1 * d1 + d2 * d2 + EPS
    coef = jnp.where(dot >= 0, 0.0, (1.0 - ns) * dot / z)
    out_ref[0, 0] = (q0 - coef * d0).astype(out_ref.dtype)
    out_ref[0, 1] = (q1 - coef * d1).astype(out_ref.dtype)
    out_ref[0, 2] = (q2 - coef * d2).astype(out_ref.dtype)


def _bwd_kernel(ns_ref, nvalid_ref, p_ref, d_ref, a_ref, b_ref, g_ref,
                dp_ref, dd_ref, da_ref, db_ref, *, tc):
    ns = ns_ref[0]
    n_valid = nvalid_ref[0]
    j = pl.program_id(1)
    p0 = p_ref[0, 0].astype(jnp.float32)
    p1 = p_ref[0, 1].astype(jnp.float32)
    p2 = p_ref[0, 2].astype(jnp.float32)
    d0 = d_ref[0, 0].astype(jnp.float32)
    d1 = d_ref[0, 1].astype(jnp.float32)
    d2 = d_ref[0, 2].astype(jnp.float32)
    a = a_ref[0, :].reshape(tc, 1)
    b = b_ref[0, :].reshape(tc, 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, TN), 1) + j * TN
    valid = (col < n_valid).astype(jnp.float32)  # (1, TN)
    g0 = g_ref[0, 0].astype(jnp.float32) * valid
    g1 = g_ref[0, 1].astype(jnp.float32) * valid
    g2 = g_ref[0, 2].astype(jnp.float32) * valid

    pnorm = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)  # (TC, TN)
    norm_e = pnorm + EPS
    s = a + b / norm_e
    q0, q1, q2 = p0 * s, p1 * s, p2 * s
    dot = q0 * d0 + q1 * d1 + q2 * d2
    z = d0 * d0 + d1 * d1 + d2 * d2 + EPS
    r = dot / z
    c1 = jnp.where(dot >= 0, 0.0, 1.0 - ns)

    dg = d0 * g0 + d1 * g1 + d2 * g2  # <d, g>
    k1 = c1 * dg / z
    dq0 = g0 - k1 * d0
    dq1 = g1 - k1 * d1
    dq2 = g2 - k1 * d2
    k2 = c1 * r
    k3 = 2.0 * k1 * r
    dd0 = -(k2 * g0 + k1 * q0 - k3 * d0)
    dd1 = -(k2 * g1 + k1 * q1 - k3 * d1)
    dd2 = -(k2 * g2 + k1 * q2 - k3 * d2)

    dqp = dq0 * p0 + dq1 * p1 + dq2 * p2  # <dq, p>
    inv_pnorm = jnp.where(pnorm > 0, 1.0 / jnp.maximum(pnorm, 1e-30), 0.0)
    coef_p = b * dqp * inv_pnorm / (norm_e * norm_e)
    dp_ref[0, 0] = (s * dq0 - coef_p * p0).astype(dp_ref.dtype)
    dp_ref[0, 1] = (s * dq1 - coef_p * p1).astype(dp_ref.dtype)
    dp_ref[0, 2] = (s * dq2 - coef_p * p2).astype(dp_ref.dtype)
    dd_ref[0, 0] = dd0.astype(dd_ref.dtype)
    dd_ref[0, 1] = dd1.astype(dd_ref.dtype)
    dd_ref[0, 2] = dd2.astype(dd_ref.dtype)
    da_ref[0, 0, 0, :] = jnp.sum(dqp, axis=1)
    db_ref[0, 0, 0, :] = jnp.sum(dqp / norm_e, axis=1)


def eligible(p) -> bool:
    """Whether the fused kernel supports this plane-layout shape."""
    return (
        p.ndim == 4
        and p.shape[1] == 3
        and _tc_for(p.shape[2]) > 0
        and p.shape[3] >= TN
    )


def _pad_n(x, n_pad):
    if x.shape[3] == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_pad - x.shape[3])))


def _block_specs(tc):
    data = pl.BlockSpec((1, 3, tc, TN), lambda i, j, k: (i, 0, k, j),
                        memory_space=pltpu.VMEM)
    ab = pl.BlockSpec((1, tc), lambda i, j, k: (0, k), memory_space=pltpu.VMEM)
    return data, ab


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_bn_leaky(p, d, a, b, negative_slope: float, interpret: bool = False):
    """p, d: (B, 3, C, N) planes; a, b: (C,) -> out (B, 3, C, N)."""
    out, _ = _fused_fwd(p, d, a, b, negative_slope, interpret)
    return out


def _fused_fwd(p, d, a, b, negative_slope, interpret):
    bsz, _, c, n = p.shape
    tc = _tc_for(c)
    n_pad = -(-n // TN) * TN
    p_p, d_p = _pad_n(p, n_pad), _pad_n(d, n_pad)
    data_spec, ab_spec = _block_specs(tc)
    grid = (bsz, n_pad // TN, c // tc)
    ns_arr = jnp.full((1,), negative_slope, jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tc=tc),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  data_spec, data_spec, ab_spec, ab_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 3, c, n_pad), p.dtype),
        interpret=interpret,
    )(ns_arr, p_p, d_p, a.reshape(1, c), b.reshape(1, c))
    return out[:, :, :, :n], (p, d, a, b)


def _fused_bwd(negative_slope, interpret, res, g):
    p, d, a, b = res
    bsz, _, c, n = p.shape
    tc = _tc_for(c)
    n_pad = -(-n // TN) * TN
    p_p, d_p, g_p = _pad_n(p, n_pad), _pad_n(d, n_pad), _pad_n(g, n_pad)
    data_spec, ab_spec = _block_specs(tc)
    nb = n_pad // TN
    grid = (bsz, nb, c // tc)
    ns_arr = jnp.full((1,), negative_slope, jnp.float32)
    nv_arr = jnp.full((1,), n, jnp.int32)
    part_spec = pl.BlockSpec((1, 1, 1, tc), lambda i, j, k: (i, j, 0, k),
                             memory_space=pltpu.VMEM)
    dp, dd, da_part, db_part = pl.pallas_call(
        functools.partial(_bwd_kernel, tc=tc),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  data_spec, data_spec, ab_spec, ab_spec, data_spec],
        out_specs=[data_spec, data_spec, part_spec, part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, 3, c, n_pad), p.dtype),
            jax.ShapeDtypeStruct((bsz, 3, c, n_pad), d.dtype),
            jax.ShapeDtypeStruct((bsz, nb, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nb, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(ns_arr, nv_arr, p_p, d_p, a.reshape(1, c), b.reshape(1, c), g_p)
    da = jnp.sum(da_part, axis=(0, 1, 2))
    db = jnp.sum(db_part, axis=(0, 1, 2))
    return dp[:, :, :, :n], dd[:, :, :, :n], da, db


fused_bn_leaky.defvjp(_fused_fwd, _fused_bwd)
