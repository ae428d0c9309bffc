"""Training losses (reference ``metrics/loss.py`` + ``utils/loss.py``).

- ``cd_loss_l1`` / ``cd_loss_l2``  <- metrics/loss.py:20-43
- ``emd_loss``                     <- metrics/loss.py:46-55
- ``calc_cd``                      <- metrics/loss.py:58-75
- ``calc_dcd`` (density-aware CD)  <- metrics/loss.py:77-118 (dup utils/loss.py)
- ``fscore_from_dists``            <- extensions/ChamferDistancePytorch/fscore.py:3-16

All jit-able and batched; DCD's per-batch python bincount loop becomes one
vmapped scatter-add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.ops.chamfer import chamfer_distance
from vn_pointcloudcompletion_tpu.ops.emd import earth_mover_distance


def _sqrt0(d: jnp.ndarray) -> jnp.ndarray:
    """``sqrt`` with a zero (not inf) gradient at exactly-zero distances.

    A predicted point that coincides exactly with a ground-truth point —
    e.g. the 448-contract coarse output appends FPS-sampled *input* points
    verbatim, and partial clouds that are subsets of the complete cloud then
    match to machine zero — would put ``d/dd sqrt(d) = inf`` into the
    chamfer backward and NaN every parameter in one step (the reference's
    ``torch.sqrt`` diverges identically; its rendered data just never hits
    an exact zero).  Values are unchanged; the subgradient 0 is the sane
    choice (a perfectly matched point exerts no pull).
    """
    pos = d > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, d, 1.0)), 0.0)


def cd_loss_l1(pcs1: jnp.ndarray, pcs2: jnp.ndarray) -> jnp.ndarray:
    """L1 Chamfer: (mean sqrt d1 + mean sqrt d2) / 2."""
    d1, d2, _, _ = chamfer_distance(pcs1, pcs2)
    return (jnp.mean(_sqrt0(d1)) + jnp.mean(_sqrt0(d2))) / 2.0


def cd_loss_l2(pcs1: jnp.ndarray, pcs2: jnp.ndarray) -> jnp.ndarray:
    """L2 Chamfer: mean d1 + mean d2."""
    d1, d2, _, _ = chamfer_distance(pcs1, pcs2)
    return jnp.mean(d1) + jnp.mean(d2)


def emd_loss(pcs1: jnp.ndarray, pcs2: jnp.ndarray) -> jnp.ndarray:
    """Mean approx-EMD cost over the batch.

    Above coarse sizes the dense (B, N, M) soft match would dominate HBM
    (1 GB/sample at 16384 points — the reference OOMs identically,
    emd_kernel.cu:26-158); the streaming trainable path takes over there
    with the same cost and the same match-constant gradients.
    """
    if pcs1.shape[1] * pcs2.shape[1] > 2048 * 2048:
        from vn_pointcloudcompletion_tpu.ops.emd import (
            earth_mover_distance_blocked,
        )

        return jnp.mean(earth_mover_distance_blocked(pcs1, pcs2))
    return jnp.mean(earth_mover_distance(pcs1, pcs2))


def fscore_from_dists(dist1, dist2, threshold=1e-4):
    """F-score on *squared* distances (fscore.py:3-16)."""
    precision_1 = jnp.mean((dist1 < threshold).astype(jnp.float32), axis=1)
    precision_2 = jnp.mean((dist2 < threshold).astype(jnp.float32), axis=1)
    f = 2 * precision_1 * precision_2 / (precision_1 + precision_2)
    f = jnp.where(precision_1 + precision_2 == 0, 0.0, f)
    return f, precision_1, precision_2


def calc_cd(output, gt, calc_f1=False, return_raw=False, separate=False):
    """Per-sample CD stats (metrics/loss.py:58-75).

    NOTE the reference's argument order: distances are computed as
    ``chamfer(gt, output)`` — dist1 is over gt points.
    """
    dist1, dist2, idx1, idx2 = chamfer_distance(gt, output)
    cd_p = (_sqrt0(dist1).mean(axis=1) + _sqrt0(dist2).mean(axis=1)) / 2
    cd_t = dist1.mean(axis=1) + dist2.mean(axis=1)
    if separate:
        res = [
            jnp.stack([_sqrt0(dist1).mean(1), _sqrt0(dist2).mean(1)]),
            jnp.stack([dist1.mean(1), dist2.mean(1)]),
        ]
    else:
        res = [cd_p, cd_t]
    if calc_f1:
        f1, _, _ = fscore_from_dists(dist1, dist2, 1e-4)
        res.append(f1)
    if return_raw:
        res.extend([dist1, dist2, idx1, idx2])
    return res


def calc_dcd(x, gt, alpha=1000, n_lambda=1, return_raw=False, non_reg=False):
    """Density-aware Chamfer distance (metrics/loss.py:77-118).

    Per-point weights are inverse nearest-neighbour assignment counts,
    ``loss = mean(1 - weight * exp(-alpha * d))`` in both directions.
    """
    ct = jnp.promote_types(jnp.result_type(x, gt), jnp.float32)
    x = x.astype(ct)
    gt = gt.astype(ct)
    n_x, n_gt = x.shape[1], gt.shape[1]
    if non_reg:
        frac_12 = max(1.0, n_x / n_gt)
        frac_21 = max(1.0, n_gt / n_x)
    else:
        frac_12 = n_x / n_gt
        frac_21 = n_gt / n_x

    cd_p, cd_t, dist1, dist2, idx1, idx2 = calc_cd(x, gt, return_raw=True)
    exp_d1 = jnp.exp(-dist1 * alpha)  # (B, n_gt)
    exp_d2 = jnp.exp(-dist2 * alpha)  # (B, n_x)

    def side(idx, exp_d, num_bins, frac):
        def one(idx_b, exp_b):
            count = jnp.zeros((num_bins,), jnp.float32).at[idx_b].add(1.0)
            weight = jax.lax.stop_gradient(count[idx_b]) ** n_lambda
            weight = (weight + 1e-6) ** (-1.0) * frac
            return jnp.mean(-exp_b * weight + 1.0)

        return jax.vmap(one)(idx, exp_d)

    loss1 = side(idx1, exp_d1, n_x, frac_21)
    loss2 = side(idx2, exp_d2, n_gt, frac_12)
    loss = (loss1 + loss2) / 2

    res = [loss, cd_p, cd_t]
    if return_raw:
        res.extend([dist1, dist2, idx1, idx2])
    return res
