"""Greedy furthest-point sampling as a single VMEM-resident Pallas program.

The jnp formulation (ops/fps.py) is a ``lax.fori_loop`` whose S-1 iterations
each dispatch a handful of XLA ops — the loop-step overhead dominates at
these sizes (~20 VPU ops x (B, N) per step).  Here the whole greedy loop
runs inside ONE kernel with the batch as the sublane axis, so every
iteration advances all B samples in the same vector registers: per step, a
(B, N) equality-select recovers each sample's last point, the distance
update and running-min are elementwise, and the first-occurrence argmax is
a row reduction.  The only HBM traffic is one read of the clouds and one
write of the (B, S) indices.

Semantics identical to ``furthest_point_sample`` (start at index 0,
first-occurrence argmax — pointnet2's kernel convention); an earlier
variant with one grid program per sample serialised the batch and measured
SLOWER end-to-end than the XLA loop (dgcnn_fps 206 -> 183 completions/s) —
batch-in-sublanes is the layout that wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38
_IMAX = 0x7FFFFFFF


def eligible(b: int, n: int, s: int) -> bool:
    # (B, N) f32 working set must sit comfortably in VMEM
    return b * n <= 512 * 1024 and n <= 16384 and s <= 4096


def _kernel(x0_ref, x1_ref, x2_ref, idx_ref, *, s: int, n: int,
            n_pad: int, s_pad: int):
    x0 = x0_ref[...]  # (B, N_pad) coordinate planes, batch in sublanes
    x1 = x1_ref[...]
    x2 = x2_ref[...]
    b = x0.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, n_pad), 1)
    valid = col < n
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (b, s_pad), 1)

    def body(i, carry):
        min_d, sel, idx_acc = carry
        pick = (col == sel).astype(jnp.float32)  # (B, N): one col per row
        l0 = jnp.sum(pick * x0, axis=1, keepdims=True)  # (B, 1)
        l1 = jnp.sum(pick * x1, axis=1, keepdims=True)
        l2 = jnp.sum(pick * x2, axis=1, keepdims=True)
        d0, d1, d2 = x0 - l0, x1 - l1, x2 - l2
        d = d0 * d0 + d1 * d1 + d2 * d2
        min_d = jnp.minimum(min_d, d)
        mx = jnp.max(min_d, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(min_d >= mx, col, _IMAX), axis=1,
                      keepdims=True)
        idx_acc = jnp.where(lane_s == i, sel, idx_acc)
        return min_d, sel, idx_acc

    init = (
        jnp.where(valid, _BIG, -_BIG),  # padded cols can never win the argmax
        jnp.zeros((b, 1), jnp.int32),
        jnp.zeros((b, s_pad), jnp.int32),  # idx[:, 0] = 0 (reference start)
    )
    _, _, idx_acc = jax.lax.fori_loop(1, s, body, init)
    idx_ref[...] = idx_acc


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def furthest_point_sample_pallas(xyz: jnp.ndarray, s: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) -> idx (B, S) int32, greedy max-min from index 0."""
    b, n, _ = xyz.shape
    n_pad = -(-n // 128) * 128
    s_pad = -(-s // 128) * 128
    xt = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if n_pad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, n_pad - n)))
    planes = [xt[:, j, :] for j in range(3)]  # 3 x (B, N_pad)
    full = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    idx = pl.pallas_call(
        functools.partial(_kernel, s=s, n=n, n_pad=n_pad, s_pad=s_pad),
        in_specs=[full((b, n_pad))] * 3,
        out_specs=full((b, s_pad)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad), jnp.int32),
        interpret=interpret,
    )(*planes)
    return idx[:, :s]
