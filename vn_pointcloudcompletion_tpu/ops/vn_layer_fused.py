"""Fully-fused VN layer: channel matmul + norm-BatchNorm + leaky-reflect.

``ops/vn_fused.py`` fuses the post-matmul BN + leaky chain, but the matmul
outputs ``p = W x`` and ``d = Wd x`` still round-trip HBM — at decoder sizes
(C=256, N=16384, batch 16) that is ~1.6 GB of activation traffic per layer
per direction, and the train-mode BatchNorm statistics add several more
full-size f32 autodiff passes in the backward.  This module fuses the WHOLE
layer (reference semantics: ``models/vn_layers.py:46-74``) into two Pallas
ops that read the input activation and write the output, nothing else:

- :func:`vn_layer_stats` — per-channel sums of ``(|p| + EPS)`` and its
  square, computing ``p`` tile-by-tile in VMEM (recomputed, never stored).
  Custom VJP routes the BatchNorm-statistics gradient analytically.
- :func:`vn_layer_fused` — recomputes ``p``/``d`` per tile and applies the
  folded-BN + leaky epilogue (same math as ``vn_fused``), with a custom VJP
  that also recomputes ``p``/``d`` and emits ``dx`` plus per-batch partials
  for ``dW``/``dWd``/``dA``/``dB``/bias grads — no (B, 3, C, N) residuals.

The matmul FLOPs are paid 2-3x (stats + fwd + bwd recompute), which is the
right trade exactly where this op is gated on: bandwidth-bound layers with
small channel counts (C_out <= 512) and many points (N >= 4096).  FLOP-dense
layers (the encoder's 1024/4096-channel trunk) keep the split
matmul + ``vn_fused`` path.

An optional per-sample bias pair (``pbias``, ``dbias``: (B, 3, C_out, 1))
supports the fold decoder's first layer, where the global-latent contribution
is a per-sample constant added to a rank-2 seed/point matmul
(see ``models/pcn._VNSplitFoldLayer``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6  # models/vn_layers.py:10

TN = 512


def layer_eligible(x, c_out: int, share_nonlinearity: bool = False) -> bool:
    """Plane-layout (B, 3, C_in, N) shapes this op accepts AND should win on:
    bandwidth-bound layers (small channels, many points)."""
    if share_nonlinearity or x.ndim != 4 or x.shape[1] != 3:
        return False
    c_in, n = x.shape[2], x.shape[3]
    aligned = lambda c: c % 128 == 0 or c <= 128
    return aligned(c_out) and c_in <= 512 and c_out <= 512 and n >= 4096


def _pad_n(t, n_pad):
    if t.shape[-1] == n_pad:
        return t
    return jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, n_pad - t.shape[-1])])


def _dot(w_ref, x_plane, bf16: bool):
    """(C_out, C_in) @ (C_in, TN) with f32 accumulation."""
    if bf16:
        return jax.lax.dot_general(
            w_ref[...].astype(jnp.bfloat16), x_plane.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    return jax.lax.dot_general(
        w_ref[...].astype(jnp.float32), x_plane.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _expand_mat(group: int, g_pad: int, tile_j):
    """(G, TN) 0/1 matrix expanding per-group bias columns to this tile's
    columns: E[g, n] = [(tile_j * TN + n) // group == g].  Generated
    in-register; the bias block holds ALL groups (a few hundred KB, resident
    across tiles) because narrow per-tile blocks violate the TPU lane-dim
    block constraints."""
    gi = jax.lax.broadcasted_iota(jnp.int32, (g_pad, TN), 0)
    ni = (jax.lax.broadcasted_iota(jnp.int32, (g_pad, TN), 1)
          + tile_j * TN) // group
    return (gi == ni).astype(jnp.float32)


def _compute_pd(x_ref, w_ref, wd_ref, pb_ref, db_ref, bf16: bool,
                group: int = 0, tile_j=None):
    """Recompute p, d planes for one (1, 3, C_in, TN) input block.

    Under bf16 the accumulated planes are rounded through bf16 before the
    epilogue — the unfused path stores ``p``/``d`` as bf16 activations, so
    this keeps the fused layer bit-compatible with it (stats included).

    ``group > 0``: the bias blocks hold one column per ``group`` output
    columns (the fold decoders' per-centre features, constant across each
    centre's S grid points); they are expanded in-register via a constant
    0/1 matmul, so the (B, 3, C, N*S) expansion never exists in HBM.
    """
    e = _expand_mat(group, pb_ref.shape[3], tile_j) if group else None
    with_d = wd_ref is not None
    p, d = [], []
    for j in range(3):
        xj = x_ref[0, j]
        pj = _dot(w_ref, xj, bf16)
        dj = _dot(wd_ref, xj, bf16) if with_d else None
        if pb_ref is not None:
            pb = pb_ref[0, j].astype(jnp.float32)
            if group:
                pb = jax.lax.dot_general(
                    pb, e, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            pj = pj + pb  # (C_out, 1) or (C_out, TN)
            if with_d:
                db = db_ref[0, j].astype(jnp.float32)
                if group:
                    db = jax.lax.dot_general(
                        db, e, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                dj = dj + db
        if bf16:
            pj = pj.astype(jnp.bfloat16).astype(jnp.float32)
            if with_d:
                dj = dj.astype(jnp.bfloat16).astype(jnp.float32)
        p.append(pj)
        d.append(dj)
    return p, d


def _epilogue(p, d, a, b, ns):
    """Folded-BN + leaky-reflect on f32 plane triples (vn_fused fwd math)."""
    p0, p1, p2 = p
    d0, d1, d2 = d
    norm_e = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2) + EPS
    s = a + b / norm_e
    q0, q1, q2 = p0 * s, p1 * s, p2 * s
    dot = q0 * d0 + q1 * d1 + q2 * d2
    z = d0 * d0 + d1 * d1 + d2 * d2 + EPS
    coef = jnp.where(dot >= 0, 0.0, (1.0 - ns) * dot / z)
    return (q0 - coef * d0, q1 - coef * d1, q2 - coef * d2)


# ----------------------------------------------------------------------------
# stats op: per-channel sums of (|p| + EPS) and (|p| + EPS)^2
# ----------------------------------------------------------------------------


def _stats_fwd_kernel(nv_ref, x_ref, w_ref, *rest, bf16: bool, has_bias: bool,
                      group: int):
    if has_bias:
        pb_ref, s1_ref, s2_ref = rest
    else:
        (s1_ref, s2_ref) = rest
        pb_ref = None
    j = pl.program_id(1)
    p, _d = _compute_pd(x_ref, w_ref, None, pb_ref, None, bf16, group, j)
    p0, p1, p2 = p
    norm_e = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2) + EPS  # (C, TN)
    col = jax.lax.broadcasted_iota(jnp.int32, norm_e.shape, 1) + j * TN
    valid = col < nv_ref[0]
    n1 = jnp.where(valid, norm_e, 0.0)
    n2 = jnp.where(valid, norm_e * norm_e, 0.0)

    @pl.when(j == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    s1_ref[0, 0, :] += jnp.sum(n1, axis=1)
    s2_ref[0, 0, :] += jnp.sum(n2, axis=1)


def _stats_bwd_kernel(nv_ref, x_ref, w_ref, *rest, bf16: bool, has_bias: bool,
                      group: int):
    if has_bias:
        pb_ref, c1_ref, c2_ref, dx_ref, dw_ref, dpb_ref = rest
    else:
        c1_ref, c2_ref, dx_ref, dw_ref = rest
        pb_ref = dpb_ref = None
    j = pl.program_id(1)
    p, _ = _compute_pd(x_ref, w_ref, None, pb_ref, None, bf16, group, j)
    p0, p1, p2 = p
    pnorm = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
    norm_e = pnorm + EPS
    c1 = c1_ref[0, 0, :].reshape(-1, 1)
    c2 = c2_ref[0, 0, :].reshape(-1, 1)
    # d(s1)/dp = c1 * p/|p|;  d(s2)/dp = 2 c2 (|p|+EPS) * p/|p|
    scale = (c1 + 2.0 * c2 * norm_e) * jnp.where(
        pnorm > 0, 1.0 / jnp.maximum(pnorm, 1e-30), 0.0
    )
    col = jax.lax.broadcasted_iota(jnp.int32, pnorm.shape, 1) + j * TN
    scale = jnp.where(col < nv_ref[0], scale, 0.0)
    dp = (scale * p0, scale * p1, scale * p2)

    @pl.when(j == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        if dpb_ref is not None:
            dpb_ref[...] = jnp.zeros_like(dpb_ref)

    e_t = (_expand_mat(group, dpb_ref.shape[3], j).T if group else None)
    for jj in range(3):
        dpj = dp[jj]
        xj = x_ref[0, jj]
        if bf16:
            dx = jax.lax.dot_general(
                w_ref[...].astype(jnp.bfloat16).T, dpj.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                dpj.astype(jnp.bfloat16), xj.astype(jnp.bfloat16).T,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        else:
            dx = jax.lax.dot_general(
                w_ref[...].astype(jnp.float32).T, dpj,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                dpj, xj.astype(jnp.float32).T,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dx_ref[0, jj] = dx.astype(dx_ref.dtype)
        dw_ref[0] += dw
        if dpb_ref is not None:
            if group:
                dpb_ref[0, jj] += jax.lax.dot_general(
                    dpj, e_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dpb_ref[0, jj, :, 0] += jnp.sum(dpj, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def vn_layer_stats(x, w, pbias, bf16: bool = False, interpret: bool = False,
                   group: int = 0):
    """Per-channel norm sums of the (recomputed) pre-activation ``p = W x``.

    x: (B, 3, C_in, N); w: (C_out, C_in); pbias: (B, 3, C_out, 1) or None.
    Returns ``(s1, s2)``: (C_out,) sums over batch and points of
    ``|p| + EPS`` and ``(|p| + EPS)^2`` — feed to the BN moment math as
    ``mean = s1 / (B*N)``, ``mean2 = s2 / (B*N)``.
    """
    out, _ = _stats_fwd(x, w, pbias, bf16, interpret, group)
    return out


def _bias_spec(c_out, group, g_pad=0):
    if group:
        return pl.BlockSpec((1, 3, c_out, g_pad), lambda i, j: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, 3, c_out, 1), lambda i, j: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _stats_specs(bsz, c_in, c_out, has_bias, group=0, g_pad=0):
    x_spec = pl.BlockSpec((1, 3, c_in, TN), lambda i, j: (i, 0, 0, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c_out, c_in), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    pb_spec = _bias_spec(c_out, group, g_pad)
    s_spec = pl.BlockSpec((1, 1, c_out), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return x_spec, w_spec, pb_spec, s_spec


def _stats_fwd(x, w, pbias, bf16, interpret, group=0):
    bsz, _, c_in, n = x.shape
    c_out = w.shape[0]
    has_bias = pbias is not None
    assert not group or (TN % group == 0 and pbias is not None)
    n_pad = -(-n // TN) * TN
    x_p = _pad_n(x, n_pad)
    nv = jnp.full((1,), n, jnp.int32)
    g_pad = n_pad // group if group else 0
    x_spec, w_spec, pb_spec, s_spec = _stats_specs(
        bsz, c_in, c_out, has_bias, group, g_pad)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, w_spec]
    args = [nv, x_p, w]
    if has_bias:
        in_specs.append(pb_spec)
        args.append(_pad_n(pbias, g_pad) if group else pbias)
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_fwd_kernel, bf16=bf16, has_bias=has_bias,
                          group=group),
        grid=(bsz, n_pad // TN),
        in_specs=in_specs,
        out_specs=[s_spec, s_spec],
        out_shape=[jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)),
        interpret=interpret,
    )(*args)
    return (jnp.sum(s1, axis=(0, 1)), jnp.sum(s2, axis=(0, 1))), (x, w, pbias)


def _stats_bwd(bf16, interpret, group, res, cts):
    x, w, pbias = res
    c1, c2 = cts
    bsz, _, c_in, n = x.shape
    c_out = w.shape[0]
    has_bias = pbias is not None
    n_pad = -(-n // TN) * TN
    x_p = _pad_n(x, n_pad)
    nv = jnp.full((1,), n, jnp.int32)
    g_pad = n_pad // group if group else 0
    x_spec, w_spec, pb_spec, s_spec = _stats_specs(
        bsz, c_in, c_out, has_bias, group, g_pad)
    dw_spec = pl.BlockSpec((1, c_out, c_in), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, w_spec]
    args = [nv, x_p, w]
    if has_bias:
        in_specs.append(pb_spec)
        args.append(_pad_n(pbias, g_pad) if group else pbias)
    in_specs += [s_spec, s_spec]
    args += [jnp.broadcast_to(c1.reshape(1, 1, c_out).astype(jnp.float32),
                              (bsz, 1, c_out)),
             jnp.broadcast_to(c2.reshape(1, 1, c_out).astype(jnp.float32),
                              (bsz, 1, c_out))]
    out_specs = [x_spec, dw_spec]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, 3, c_in, n_pad), x.dtype),
        jax.ShapeDtypeStruct((bsz, c_out, c_in), jnp.float32),
    ]
    if has_bias:
        out_specs.append(pb_spec)
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, 3, c_out, g_pad or 1), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_stats_bwd_kernel, bf16=bf16, has_bias=has_bias,
                          group=group),
        grid=(bsz, n_pad // TN),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)),
        interpret=interpret,
    )(*args)
    dx = outs[0][:, :, :, :n]
    dw = jnp.sum(outs[1], axis=0)
    if has_bias:
        dpb = outs[2].astype(pbias.dtype)
        if group:
            dpb = dpb[:, :, :, : pbias.shape[3]]
    else:
        dpb = None
    return dx, dw.astype(w.dtype), dpb


vn_layer_stats.defvjp(
    lambda x, w, pbias, bf16, interpret, group: _stats_fwd(
        x, w, pbias, bf16, interpret, group),
    _stats_bwd,
)


# ----------------------------------------------------------------------------
# fused layer op
# ----------------------------------------------------------------------------


def _layer_fwd_kernel(ns_ref, x_ref, w_ref, wd_ref, *rest,
                      bf16: bool, has_bias: bool, group: int):
    if has_bias:
        pb_ref, db_ref, a_ref, b_ref, out_ref = rest
    else:
        a_ref, b_ref, out_ref = rest
        pb_ref = db_ref = None
    ns = ns_ref[0]
    p, d = _compute_pd(x_ref, w_ref, wd_ref, pb_ref, db_ref, bf16, group,
                       pl.program_id(1))
    a = a_ref[0, :].reshape(-1, 1)
    b = b_ref[0, :].reshape(-1, 1)
    o0, o1, o2 = _epilogue(p, d, a, b, ns)
    out_ref[0, 0] = o0.astype(out_ref.dtype)
    out_ref[0, 1] = o1.astype(out_ref.dtype)
    out_ref[0, 2] = o2.astype(out_ref.dtype)


def _layer_bwd_kernel(ns_ref, x_ref, w_ref, wd_ref, *rest,
                      bf16: bool, has_bias: bool, group: int):
    if has_bias:
        (pb_ref, db_ref, a_ref, b_ref, g_ref,
         dx_ref, dw_ref, dwd_ref, da_ref, db2_ref, dpb_ref, ddb_ref) = rest
    else:
        (a_ref, b_ref, g_ref,
         dx_ref, dw_ref, dwd_ref, da_ref, db2_ref) = rest
        pb_ref = db_ref = dpb_ref = ddb_ref = None
    ns = ns_ref[0]
    j = pl.program_id(1)
    p, d = _compute_pd(x_ref, w_ref, wd_ref, pb_ref, db_ref, bf16, group, j)
    p0, p1, p2 = p
    d0, d1, d2 = d
    a = a_ref[0, :].reshape(-1, 1)
    b = b_ref[0, :].reshape(-1, 1)
    g0 = g_ref[0, 0].astype(jnp.float32)
    g1 = g_ref[0, 1].astype(jnp.float32)
    g2 = g_ref[0, 2].astype(jnp.float32)

    # identical math to ops/vn_fused._bwd_kernel (verified there vs autodiff)
    pnorm = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
    norm_e = pnorm + EPS
    s = a + b / norm_e
    q0, q1, q2 = p0 * s, p1 * s, p2 * s
    dot = q0 * d0 + q1 * d1 + q2 * d2
    z = d0 * d0 + d1 * d1 + d2 * d2 + EPS
    r = dot / z
    c1 = jnp.where(dot >= 0, 0.0, 1.0 - ns)
    dg = d0 * g0 + d1 * g1 + d2 * g2
    k1 = c1 * dg / z
    dq0, dq1, dq2 = g0 - k1 * d0, g1 - k1 * d1, g2 - k1 * d2
    k2 = c1 * r
    k3 = 2.0 * k1 * r
    dd0 = -(k2 * g0 + k1 * q0 - k3 * d0)
    dd1 = -(k2 * g1 + k1 * q1 - k3 * d1)
    dd2 = -(k2 * g2 + k1 * q2 - k3 * d2)
    dqp = dq0 * p0 + dq1 * p1 + dq2 * p2
    inv_pnorm = jnp.where(pnorm > 0, 1.0 / jnp.maximum(pnorm, 1e-30), 0.0)
    coef_p = b * dqp * inv_pnorm / (norm_e * norm_e)
    dp0 = s * dq0 - coef_p * p0
    dp1 = s * dq1 - coef_p * p1
    dp2 = s * dq2 - coef_p * p2

    @pl.when(j == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        if dpb_ref is not None:
            dpb_ref[...] = jnp.zeros_like(dpb_ref)
            ddb_ref[...] = jnp.zeros_like(ddb_ref)

    da_ref[0, 0, :] += jnp.sum(dqp, axis=1)
    db2_ref[0, 0, :] += jnp.sum(dqp / norm_e, axis=1)

    dps = (dp0, dp1, dp2)
    dds = (dd0, dd1, dd2)
    e_t = (_expand_mat(group, dpb_ref.shape[3], j).T if group else None)
    for jj in range(3):
        dpj, ddj = dps[jj], dds[jj]
        xj = x_ref[0, jj]
        if bf16:
            w16, wd16 = w_ref[...].astype(jnp.bfloat16), wd_ref[...].astype(jnp.bfloat16)
            dp16, dd16 = dpj.astype(jnp.bfloat16), ddj.astype(jnp.bfloat16)
            x16 = xj.astype(jnp.bfloat16)
            dx = jax.lax.dot_general(
                w16.T, dp16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx += jax.lax.dot_general(
                wd16.T, dd16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                dp16, x16.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwd = jax.lax.dot_general(
                dd16, x16.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            wf, wdf = w_ref[...].astype(jnp.float32), wd_ref[...].astype(jnp.float32)
            xf = xj.astype(jnp.float32)
            dx = jax.lax.dot_general(
                wf.T, dpj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx += jax.lax.dot_general(
                wdf.T, ddj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                dpj, xf.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwd = jax.lax.dot_general(
                ddj, xf.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx_ref[0, jj] = dx.astype(dx_ref.dtype)
        dw_ref[0] += dw
        dwd_ref[0] += dwd
        if dpb_ref is not None:
            if group:
                dpb_ref[0, jj] += jax.lax.dot_general(
                    dpj, e_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ddb_ref[0, jj] += jax.lax.dot_general(
                    ddj, e_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dpb_ref[0, jj, :, 0] += jnp.sum(dpj, axis=1)
                ddb_ref[0, jj, :, 0] += jnp.sum(ddj, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def vn_layer_fused(x, w, wd, pbias, dbias, a, b,
                   negative_slope: float, bf16: bool = False,
                   interpret: bool = False, group: int = 0):
    """One-pass VN layer: ``bn_leaky(W x (+pbias), Wd x (+dbias))``.

    x: (B, 3, C_in, N) planes; w, wd: (C_out, C_in); a, b: (C_out,)
    folded-BN affine.  pbias/dbias are per-sample (B, 3, C_out, 1) constants
    (``group=0``), per-group (B, 3, C_out, N//group) features expanded
    in-register (``group=S``, the fold decoders' per-centre features), or
    both None.  Semantics identical to ``_channel_linear_plane`` +
    ``fused_bn_leaky`` over the expanded bias.
    """
    out, _ = _layer_fwd(x, w, wd, pbias, dbias, a, b,
                        negative_slope, bf16, interpret, group)
    return out


def _layer_specs(c_in, c_out, group=0, g_pad=0):
    x_spec = pl.BlockSpec((1, 3, c_in, TN), lambda i, j: (i, 0, 0, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((c_out, c_in), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = _bias_spec(c_out, group, g_pad)
    ab_spec = pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 3, c_out, TN), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    return x_spec, w_spec, bias_spec, ab_spec, out_spec


def _layer_fwd(x, w, wd, pbias, dbias, a, b, negative_slope, bf16, interpret,
               group=0):
    bsz, _, c_in, n = x.shape
    c_out = w.shape[0]
    has_bias = pbias is not None
    assert not group or (TN % group == 0 and has_bias)
    n_pad = -(-n // TN) * TN
    x_p = _pad_n(x, n_pad)
    ns_arr = jnp.full((1,), negative_slope, jnp.float32)
    g_pad = n_pad // group if group else 0
    x_spec, w_spec, bias_spec, ab_spec, out_spec = _layer_specs(
        c_in, c_out, group, g_pad)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, w_spec, w_spec]
    args = [ns_arr, x_p, w, wd]
    if has_bias:
        in_specs += [bias_spec, bias_spec]
        if group:
            args += [_pad_n(pbias, g_pad), _pad_n(dbias, g_pad)]
        else:
            args += [pbias, dbias]
    in_specs += [ab_spec, ab_spec]
    args += [a.reshape(1, c_out).astype(jnp.float32),
             b.reshape(1, c_out).astype(jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_layer_fwd_kernel, bf16=bf16, has_bias=has_bias,
                          group=group),
        grid=(bsz, n_pad // TN),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 3, c_out, n_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.PARALLEL)),
        interpret=interpret,
    )(*args)
    return out[:, :, :, :n], (x, w, wd, pbias, dbias, a, b)


def _layer_bwd(negative_slope, bf16, interpret, group, res, g):
    x, w, wd, pbias, dbias, a, b = res
    bsz, _, c_in, n = x.shape
    c_out = w.shape[0]
    has_bias = pbias is not None
    n_pad = -(-n // TN) * TN
    x_p = _pad_n(x, n_pad)
    g_p = _pad_n(g, n_pad)  # zero-padded cols contribute nothing
    ns_arr = jnp.full((1,), negative_slope, jnp.float32)
    g_pad = n_pad // group if group else 0
    x_spec, w_spec, bias_spec, ab_spec, out_spec = _layer_specs(
        c_in, c_out, group, g_pad)
    dw_spec = pl.BlockSpec((1, c_out, c_in), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dab_spec = pl.BlockSpec((1, 1, c_out), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, w_spec, w_spec]
    args = [ns_arr, x_p, w, wd]
    if has_bias:
        in_specs += [bias_spec, bias_spec]
        if group:
            args += [_pad_n(pbias, g_pad), _pad_n(dbias, g_pad)]
        else:
            args += [pbias, dbias]
    in_specs += [ab_spec, ab_spec, out_spec]
    args += [a.reshape(1, c_out).astype(jnp.float32),
             b.reshape(1, c_out).astype(jnp.float32), g_p]
    out_specs = [x_spec, dw_spec, dw_spec, dab_spec, dab_spec]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, 3, c_in, n_pad), x.dtype),
        jax.ShapeDtypeStruct((bsz, c_out, c_in), jnp.float32),
        jax.ShapeDtypeStruct((bsz, c_out, c_in), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32),
    ]
    if has_bias:
        out_specs += [bias_spec, bias_spec]
        out_shape += [
            jax.ShapeDtypeStruct((bsz, 3, c_out, g_pad or 1), jnp.float32)] * 2
    outs = pl.pallas_call(
        functools.partial(_layer_bwd_kernel, bf16=bf16, has_bias=has_bias,
                          group=group),
        grid=(bsz, n_pad // TN),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)),
        interpret=interpret,
    )(*args)
    dx = outs[0][:, :, :, :n]
    dw = jnp.sum(outs[1], axis=0).astype(w.dtype)
    dwd = jnp.sum(outs[2], axis=0).astype(wd.dtype)
    da = jnp.sum(outs[3], axis=(0, 1)).astype(a.dtype)
    db = jnp.sum(outs[4], axis=(0, 1)).astype(b.dtype)
    if has_bias:
        dpb = outs[5].astype(pbias.dtype)
        ddb = outs[6].astype(dbias.dtype)
        if group:
            dpb = dpb[:, :, :, : pbias.shape[3]]
            ddb = ddb[:, :, :, : dbias.shape[3]]
    else:
        dpb = ddb = None
    return dx, dw, dwd, dpb, ddb, da, db


vn_layer_fused.defvjp(
    lambda x, w, wd, pbias, dbias, a, b, ns, bf16, interpret, group: (
        _layer_fwd(x, w, wd, pbias, dbias, a, b, ns, bf16, interpret, group)),
    _layer_bwd,
)


# ----------------------------------------------------------------------------
# projected layer op: fused layer followed by a 1-channel output contraction
# ----------------------------------------------------------------------------
#
# The fold decoders end in VNLinear(1) over the preceding fused layer's
# (B, 3, C, N) output (models/pcn.py final_conv_2 / vn_folding*_2) — that
# tensor exists only to be contracted to one channel.  Emitting the
# projection from the kernel removes the ~400 MB round-trip and the
# projection's own backward passes; the VJP expands the (B, 3, 1, N)
# cotangent through the rank-1 projection in-register.


def _proj_fwd_kernel(ns_ref, x_ref, w_ref, wd_ref, *rest,
                     bf16: bool, has_bias: bool, group: int):
    if has_bias:
        pb_ref, db_ref, a_ref, b_ref, wo_ref, out_ref = rest
    else:
        a_ref, b_ref, wo_ref, out_ref = rest
        pb_ref = db_ref = None
    ns = ns_ref[0]
    p, d = _compute_pd(x_ref, w_ref, wd_ref, pb_ref, db_ref, bf16,
                       group, pl.program_id(1))
    a = a_ref[0, :].reshape(-1, 1)
    b = b_ref[0, :].reshape(-1, 1)
    o0, o1, o2 = _epilogue(p, d, a, b, ns)
    wo = wo_ref[0, :].reshape(-1, 1)  # (C, 1)
    out_ref[0, 0, 0] = jnp.sum(o0 * wo, axis=0).astype(out_ref.dtype)
    out_ref[0, 1, 0] = jnp.sum(o1 * wo, axis=0).astype(out_ref.dtype)
    out_ref[0, 2, 0] = jnp.sum(o2 * wo, axis=0).astype(out_ref.dtype)


def _proj_bwd_kernel(ns_ref, x_ref, w_ref, wd_ref, *rest,
                     bf16: bool, has_bias: bool, group: int):
    if has_bias:
        (pb_ref, db_ref, a_ref, b_ref, wo_ref, g_ref,
         dx_ref, dw_ref, dwd_ref, da_ref, db2_ref, dwo_ref,
         dpb_ref, ddb_ref) = rest
    else:
        (a_ref, b_ref, wo_ref, g_ref,
         dx_ref, dw_ref, dwd_ref, da_ref, db2_ref, dwo_ref) = rest
        pb_ref = db_ref = dpb_ref = ddb_ref = None
    ns = ns_ref[0]
    j = pl.program_id(1)
    p, d = _compute_pd(x_ref, w_ref, wd_ref, pb_ref, db_ref, bf16, group, j)
    p0, p1, p2 = p
    d0, d1, d2 = d
    a = a_ref[0, :].reshape(-1, 1)
    b = b_ref[0, :].reshape(-1, 1)
    wo = wo_ref[0, :].reshape(-1, 1)
    # cotangent through the rank-1 projection: go_c = wo_c * g (per plane)
    gp0 = g_ref[0, 0, 0].reshape(1, -1)
    gp1 = g_ref[0, 1, 0].reshape(1, -1)
    gp2 = g_ref[0, 2, 0].reshape(1, -1)
    g0 = wo * gp0.astype(jnp.float32)
    g1 = wo * gp1.astype(jnp.float32)
    g2 = wo * gp2.astype(jnp.float32)

    pnorm = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
    norm_e = pnorm + EPS
    s = a + b / norm_e
    q0, q1, q2 = p0 * s, p1 * s, p2 * s
    dot = q0 * d0 + q1 * d1 + q2 * d2
    z = d0 * d0 + d1 * d1 + d2 * d2 + EPS
    r = dot / z
    c1 = jnp.where(dot >= 0, 0.0, 1.0 - ns)
    # dwo needs the epilogue output o = q - coef d
    coef = c1 * r
    o0, o1, o2 = q0 - coef * d0, q1 - coef * d1, q2 - coef * d2
    dg = d0 * g0 + d1 * g1 + d2 * g2
    k1 = c1 * dg / z
    dq0, dq1, dq2 = g0 - k1 * d0, g1 - k1 * d1, g2 - k1 * d2
    k2 = c1 * r
    k3 = 2.0 * k1 * r
    dd0 = -(k2 * g0 + k1 * q0 - k3 * d0)
    dd1 = -(k2 * g1 + k1 * q1 - k3 * d1)
    dd2 = -(k2 * g2 + k1 * q2 - k3 * d2)
    dqp = dq0 * p0 + dq1 * p1 + dq2 * p2
    inv_pnorm = jnp.where(pnorm > 0, 1.0 / jnp.maximum(pnorm, 1e-30), 0.0)
    coef_p = b * dqp * inv_pnorm / (norm_e * norm_e)
    dp0 = s * dq0 - coef_p * p0
    dp1 = s * dq1 - coef_p * p1
    dp2 = s * dq2 - coef_p * p2

    @pl.when(j == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        if dpb_ref is not None:
            dpb_ref[...] = jnp.zeros_like(dpb_ref)
            ddb_ref[...] = jnp.zeros_like(ddb_ref)

    da_ref[0, 0, :] += jnp.sum(dqp, axis=1)
    db2_ref[0, 0, :] += jnp.sum(dqp / norm_e, axis=1)
    dwo_ref[0, 0, :] += jnp.sum(
        o0 * gp0 + o1 * gp1 + o2 * gp2, axis=1)

    e_t = (_expand_mat(group, dpb_ref.shape[3], j).T if group else None)
    dps = (dp0, dp1, dp2)
    dds = (dd0, dd1, dd2)
    for jj in range(3):
        dpj, ddj = dps[jj], dds[jj]
        xj = x_ref[0, jj]
        if bf16:
            w16 = w_ref[...].astype(jnp.bfloat16)
            wd16 = wd_ref[...].astype(jnp.bfloat16)
            dp16, dd16 = dpj.astype(jnp.bfloat16), ddj.astype(jnp.bfloat16)
            x16 = xj.astype(jnp.bfloat16)
            dx = jax.lax.dot_general(
                w16.T, dp16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx += jax.lax.dot_general(
                wd16.T, dd16, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                dp16, x16.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwd = jax.lax.dot_general(
                dd16, x16.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            wf = w_ref[...].astype(jnp.float32)
            wdf = wd_ref[...].astype(jnp.float32)
            xf = xj.astype(jnp.float32)
            dx = jax.lax.dot_general(
                wf.T, dpj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx += jax.lax.dot_general(
                wdf.T, ddj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw = jax.lax.dot_general(
                dpj, xf.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwd = jax.lax.dot_general(
                ddj, xf.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx_ref[0, jj] = dx.astype(dx_ref.dtype)
        dw_ref[0] += dw
        dwd_ref[0] += dwd
        if dpb_ref is not None:
            if group:
                dpb_ref[0, jj] += jax.lax.dot_general(
                    dpj, e_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ddb_ref[0, jj] += jax.lax.dot_general(
                    ddj, e_t, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                dpb_ref[0, jj, :, 0] += jnp.sum(dpj, axis=1)
                ddb_ref[0, jj, :, 0] += jnp.sum(ddj, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def vn_layer_fused_project(x, w, wd, pbias, dbias, a, b, w_out,
                           negative_slope: float, bf16: bool = False,
                           interpret: bool = False, group: int = 0):
    """``einsum('c,bjcn->bj1n', w_out, bn_leaky(Wx, Wd x))`` in one pass.

    Same layer semantics as :func:`vn_layer_fused` followed by a 1-channel
    ``VNLinear`` contraction (``w_out``: (C_out,)); the intermediate
    (B, 3, C, N) activation never exists.  Returns (B, 3, 1, N).
    """
    out, _ = _proj_fwd(x, w, wd, pbias, dbias, a, b, w_out,
                       negative_slope, bf16, interpret, group)
    return out


def _proj_fwd(x, w, wd, pbias, dbias, a, b, w_out, ns, bf16, interpret, group):
    bsz, _, c_in, n = x.shape
    c_out = w.shape[0]
    has_bias = pbias is not None
    n_pad = -(-n // TN) * TN
    x_p = _pad_n(x, n_pad)
    ns_arr = jnp.full((1,), ns, jnp.float32)
    g_pad = n_pad // group if group else 0
    x_spec, w_spec, bias_spec, ab_spec, _ = _layer_specs(c_in, c_out, group,
                                                         g_pad)
    out_spec = pl.BlockSpec((1, 3, 1, TN), lambda i, j: (i, 0, 0, j),
                            memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, w_spec, w_spec]
    args = [ns_arr, x_p, w, wd]
    if has_bias:
        in_specs += [bias_spec, bias_spec]
        if group:
            args += [_pad_n(pbias, g_pad), _pad_n(dbias, g_pad)]
        else:
            args += [pbias, dbias]
    in_specs += [ab_spec, ab_spec, ab_spec]
    args += [a.reshape(1, c_out).astype(jnp.float32),
             b.reshape(1, c_out).astype(jnp.float32),
             w_out.reshape(1, c_out).astype(jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_proj_fwd_kernel, bf16=bf16, has_bias=has_bias,
                          group=group),
        grid=(bsz, n_pad // TN),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, 3, 1, n_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.PARALLEL)),
        interpret=interpret,
    )(*args)
    return out[:, :, :, :n], (x, w, wd, pbias, dbias, a, b, w_out)


def _proj_bwd(ns, bf16, interpret, group, res, g):
    x, w, wd, pbias, dbias, a, b, w_out = res
    bsz, _, c_in, n = x.shape
    c_out = w.shape[0]
    has_bias = pbias is not None
    n_pad = -(-n // TN) * TN
    x_p = _pad_n(x, n_pad)
    g_p = _pad_n(g, n_pad)
    ns_arr = jnp.full((1,), ns, jnp.float32)
    g_pad = n_pad // group if group else 0
    x_spec, w_spec, bias_spec, ab_spec, _ = _layer_specs(c_in, c_out, group,
                                                         g_pad)
    gout_spec = pl.BlockSpec((1, 3, 1, TN), lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec((1, c_out, c_in), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dab_spec = pl.BlockSpec((1, 1, c_out), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, w_spec, w_spec]
    args = [ns_arr, x_p, w, wd]
    if has_bias:
        in_specs += [bias_spec, bias_spec]
        if group:
            args += [_pad_n(pbias, g_pad), _pad_n(dbias, g_pad)]
        else:
            args += [pbias, dbias]
    in_specs += [ab_spec, ab_spec, ab_spec, gout_spec]
    args += [a.reshape(1, c_out).astype(jnp.float32),
             b.reshape(1, c_out).astype(jnp.float32),
             w_out.reshape(1, c_out).astype(jnp.float32), g_p]
    out_specs = [x_spec, dw_spec, dw_spec, dab_spec, dab_spec, dab_spec]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, 3, c_in, n_pad), x.dtype),
        jax.ShapeDtypeStruct((bsz, c_out, c_in), jnp.float32),
        jax.ShapeDtypeStruct((bsz, c_out, c_in), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32),
        jax.ShapeDtypeStruct((bsz, 1, c_out), jnp.float32),
    ]
    if has_bias:
        out_specs += [bias_spec, bias_spec]
        out_shape += [
            jax.ShapeDtypeStruct((bsz, 3, c_out, g_pad or 1), jnp.float32)] * 2
    outs = pl.pallas_call(
        functools.partial(_proj_bwd_kernel, bf16=bf16, has_bias=has_bias,
                          group=group),
        grid=(bsz, n_pad // TN),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL, pltpu.ARBITRARY)),
        interpret=interpret,
    )(*args)
    dx = outs[0][:, :, :, :n]
    dw = jnp.sum(outs[1], axis=0).astype(w.dtype)
    dwd = jnp.sum(outs[2], axis=0).astype(wd.dtype)
    da = jnp.sum(outs[3], axis=(0, 1)).astype(a.dtype)
    db = jnp.sum(outs[4], axis=(0, 1)).astype(b.dtype)
    dwo = jnp.sum(outs[5], axis=(0, 1)).astype(w_out.dtype).reshape(
        w_out.shape)
    if has_bias:
        dpb = outs[6].astype(pbias.dtype)
        ddb = outs[7].astype(dbias.dtype)
        if group:
            dpb = dpb[:, :, :, : pbias.shape[3]]
            ddb = ddb[:, :, :, : dbias.shape[3]]
    else:
        dpb = ddb = None
    return dx, dw, dwd, dpb, ddb, da, db, dwo


vn_layer_fused_project.defvjp(
    lambda x, w, wd, pbias, dbias, a, b, w_out, ns, bf16, interpret, group: (
        _proj_fwd(x, w, wd, pbias, dbias, a, b, w_out, ns, bf16, interpret,
                  group)),
    _proj_bwd,
)
