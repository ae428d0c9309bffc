"""Furthest point sampling + gather.

Replaces the reference's external CUDA package ``pointnet2_ops``
(``furthest_point_sample`` / ``gather_operation``, used via the ``fps()``
helpers at ``models/pcn.py:6-9``, ``models/dgcnn.py:14-17``,
``models/pointr/vn_pointr.py:12-15`` and the ``fps_downsample`` methods).

TPU design: greedy max-min selection as a ``lax.fori_loop`` keeping a running
min-distance vector — O(S * N) with N = 2048, trivially vectorised on the VPU.
Selection starts at index 0 like pointnet2's kernel.  Gather is
``take_along_axis``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def furthest_point_sample(xyz: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Greedy furthest-point sampling. xyz: (B, N, 3) -> idx (B, S) int32.

    On TPU the whole greedy loop runs inside one Pallas program with the
    batch in the sublane axis (ops/fps_pallas.py): the XLA fori_loop's
    per-iteration step overhead dominates at these sizes.
    """
    if jax.default_backend() == "tpu":
        from vn_pointcloudcompletion_tpu.ops import fps_pallas

        if fps_pallas.eligible(xyz.shape[0], xyz.shape[1], num_samples):
            return fps_pallas.furthest_point_sample_pallas(xyz, num_samples)

    def single(pts):
        n = pts.shape[0]

        def body(i, carry):
            idx, min_d = carry
            last = pts[idx[i - 1]]
            d = jnp.sum((pts - last[None, :]) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            idx = idx.at[i].set(jnp.argmax(min_d).astype(jnp.int32))
            return idx, min_d

        idx0 = jnp.zeros((num_samples,), dtype=jnp.int32)
        min_d0 = jnp.full((n,), jnp.inf, dtype=jnp.float32)
        idx, _ = jax.lax.fori_loop(1, num_samples, body, (idx0, min_d0))
        return idx

    return jax.vmap(single)(xyz.astype(jnp.float32))


def fps_gather(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features at sampled indices.

    feats: (B, C, N) channel-first (pointnet2 ``gather_operation`` layout),
    idx: (B, S) -> (B, C, S).
    """
    return jnp.take_along_axis(feats, idx[:, None, :], axis=2)


def fps(pc: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Subsample a point cloud. pc: (B, N, 3) -> (B, S, 3).

    Mirrors the reference's ``fps()`` helper (``models/pcn.py:6-9``).
    """
    idx = furthest_point_sample(pc, num_samples)
    return jnp.take_along_axis(pc, idx[:, :, None], axis=1)
