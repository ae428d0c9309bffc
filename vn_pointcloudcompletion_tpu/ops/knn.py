"""k-nearest-neighbours and edge-feature construction.

Replaces the reference's external ``KNN_CUDA`` wheel (used at
``models/dgcnn.py:11``, ``models/pointr/utils/dgcnn_group.py:6``,
``models/pointr/vn_pointr.py:10``) and its flat-index gather helpers
(``get_graph_feature`` / ``vn_get_graph_feature`` at ``models/dgcnn.py:96-278``,
``models/transformer.py:6-22``).

The reference itself ships the matmul formulation as a fallback
(``models/utils/dgcnn_util.py:11-17``): pairwise distances via one batched
matmul + top-k.  That formulation is already the right one for TPU — one
MXU contraction and a ``lax.top_k`` — so it is the primary implementation
here, not a fallback.  Indices are plain (B, N, K) arrays; the reference's
flattened ``bs*k*np`` index arithmetic (a CUDA-gather artifact) is dropped in
favour of ``take_along_axis``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances. q: (B, N, D), r: (B, M, D) -> (B, N, M)."""
    q = q.astype(jnp.float32)
    r = r.astype(jnp.float32)
    q_sq = jnp.sum(q * q, axis=-1)
    r_sq = jnp.sum(r * r, axis=-1)
    cross = jnp.einsum(
        "bnd,bmd->bnm", q, r,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return q_sq[:, :, None] + r_sq[:, None, :] - 2.0 * cross


def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int):
    """k nearest neighbours of each query point within ``ref``.

    query: (B, N, D), ref: (B, M, D).  Returns ``(dists, idx)`` each (B, N, K),
    sorted ascending by distance (matching KNN_CUDA's sorted output).
    Distances are always float32 regardless of input dtype or which kernel
    path was eligible (all paths accumulate pairwise distances in f32).

    On TPU the whole op runs as one VMEM-resident Pallas kernel
    (ops/knn_pallas.py::knn_min_pallas): the (B, N, M) distance matrix is
    computed tile-by-tile in VMEM and the k smallest extracted in place —
    it never exists in HBM.  ``lax.top_k`` over the materialised matrix
    measured 15 ms for (8, 2048, 2048) k=16; the extraction-only kernel
    (3 HBM passes of the matrix) ~3.6 ms; the fused kernel ~1 ms.
    """
    if jax.default_backend() == "tpu":
        from vn_pointcloudcompletion_tpu.ops import knn_pallas

        if knn_pallas.fused_eligible(ref.shape[1], k, ref.shape[2]):
            vals, idx = knn_pallas.knn_min_pallas(query, ref, k)
            return vals.astype(jnp.float32), idx
        d = pairwise_sqdist(query, ref)
        if knn_pallas.eligible(d.shape[-1], k):
            vals, idx = knn_pallas.topk_min_pallas(d, k)
            return vals.astype(jnp.float32), idx
    else:
        d = pairwise_sqdist(query, ref)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx.astype(jnp.int32)


def gather_neighbors(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-point neighbour features.

    feats: (B, M, C), idx: (B, N, K) -> (B, N, K, C).
    """
    b, m, c = feats.shape
    n, k = idx.shape[1], idx.shape[2]
    flat = idx.reshape(b, n * k)
    out = jnp.take_along_axis(feats, flat[:, :, None], axis=1)
    return out.reshape(b, n, k, c)


def gather_planes(x: jnp.ndarray, idx: jnp.ndarray, mode: str | None = None):
    """Gather neighbour columns of plane-layout features.

    x: (B, 3, C, N), idx: (B, Nq, K) -> (B, 3, C, Nq*K).

    ``mode='onehot'`` runs the gather as a one-hot matmul on the MXU: a TPU
    gather walks rows serially and — worse — its *backward* is a scatter-add;
    as a matmul both directions are single MXU contractions.  ``mode='take'``
    is the plain ``take_along_axis`` formulation.  ``mode=None`` picks onehot
    on TPU when the one-hot operand (B*Nq*K*N elements) stays modest.
    """
    b, _, c, n = x.shape
    nq, k = idx.shape[1], idx.shape[2]
    flat = idx.reshape(b, nq * k)
    if mode is None:
        mode = (
            "onehot"
            if jax.default_backend() == "tpu"
            and b * nq * k * n <= (64 << 20)
            else "take"
        )
    if mode == "onehot":
        oh = (
            flat[:, :, None] == jnp.arange(n, dtype=jnp.int32)[None, None, :]
        ).astype(x.dtype)
        out = jnp.einsum(
            "ben,bjcn->bjce", oh, x,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(x.dtype)
        return out
    out = jnp.take_along_axis(x, flat[:, None, None, :], axis=3)
    return out


def graph_feature(
    x_q: jnp.ndarray, x_k: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Scalar EdgeConv feature: concat([neighbor - center, center]).

    x_q: (B, C, Nq) centre features, x_k: (B, C, Nk) neighbour pool,
    idx: (B, Nq, K) neighbour indices into Nk.
    Returns (B, 2C, Nq, K) — the layout of the reference's
    ``DGCNN_fps.get_graph_feature`` (``models/dgcnn.py:96-119``).
    """
    nbr = gather_neighbors(x_k.transpose(0, 2, 1), idx)  # (B, Nq, K, C)
    nbr = nbr.transpose(0, 3, 1, 2)  # (B, C, Nq, K)
    ctr = x_q[:, :, :, None]  # (B, C, Nq, 1)
    ctr = jnp.broadcast_to(ctr, nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=1)


def vn_graph_feature_planes(
    x_q: jnp.ndarray, x_k: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Plane-layout VN EdgeConv feature with the neighbour axis flattened.

    x_q: (B, 3, C, Nq), x_k: (B, 3, C, Nk), idx: (B, Nq, K).
    Returns (B, 3, 2C, Nq*K) — ready for plane-layout VNLinearLeakyReLU (a
    1x1 conv is pointwise over (N, K), so the flatten is free); reshape to
    (..., Nq, K) afterwards for the neighbour pooling.
    """
    b, _, c, nk = x_k.shape
    nq, k = idx.shape[1], idx.shape[2]
    flatk = x_k.transpose(0, 3, 1, 2).reshape(b, nk, 3 * c)
    nbr = gather_neighbors(flatk, idx)  # (B, Nq, K, 3C)
    nbr = nbr.reshape(b, nq, k, 3, c).transpose(0, 3, 4, 1, 2)  # (B,3,C,Nq,K)
    ctr = jnp.broadcast_to(x_q[:, :, :, :, None], nbr.shape)
    feat = jnp.concatenate([nbr - ctr, ctr], axis=2)  # (B, 3, 2C, Nq, K)
    return feat.reshape(b, 3, 2 * c, nq * k)


def vn_graph_feature(
    x_q: jnp.ndarray, x_k: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """Vector-neuron EdgeConv feature: concat over the channel axis.

    x_q: (B, C, 3, Nq) centre vector features, x_k: (B, C, 3, Nk),
    idx: (B, Nq, K).  Returns (B, 2C, 3, Nq, K) — the layout of
    ``VN_DGCNN_fps.vn_get_graph_feature`` (``models/dgcnn.py:250-278``) and
    the transformer variant (``models/transformer.py:6-22``).
    """
    b, c, _, nk = x_k.shape
    flatk = x_k.transpose(0, 3, 1, 2).reshape(b, nk, c * 3)  # (B, Nk, 3C)
    nbr = gather_neighbors(flatk, idx)  # (B, Nq, K, 3C)
    nq, k = idx.shape[1], idx.shape[2]
    nbr = nbr.reshape(b, nq, k, c, 3).transpose(0, 3, 4, 1, 2)  # (B, C, 3, Nq, K)
    ctr = x_q[:, :, :, :, None]
    ctr = jnp.broadcast_to(ctr, nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=1)
