"""DGCNN-family encoders.

TPU-native rebuild of ``models/dgcnn.py`` and ``models/utils/transform_net.py``:

- ``DGCNNfps``     <- reference :19-161 (EdgeConv + GroupNorm, FPS 2048->512->128)
- ``VNDGCNNfps``   <- reference :164-324 (VN EdgeConv variant)
- ``DGCNN``        <- reference :327-417 (classic k=40 DGCNN with T-Net;
                      coarse-only — its dense path references undefined
                      attributes upstream, :404-417)
- ``TransformNet`` <- models/utils/transform_net.py:12-57

kNN graphs and FPS come from ``ops`` (no CUDA externals); gathers are plain
``take_along_axis``.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.models.common import (
    BatchNormCh,
    ConvCh,
    DenseTorch,
    GroupNormCh,
)
from vn_pointcloudcompletion_tpu.nn.vn import (
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
)
from vn_pointcloudcompletion_tpu.ops.fps import fps, furthest_point_sample
from vn_pointcloudcompletion_tpu.ops.knn import graph_feature, knn


def fps_downsample_scalar(coor, x, num_group):
    """FPS on coordinates, gather coords + features (reference :78-94).

    coor: (B, 3, N), x: (B, C, N) -> (B, 3, S), (B, C, S).
    """
    idx = furthest_point_sample(coor.transpose(0, 2, 1), num_group)  # (B, S)
    new_coor = jnp.take_along_axis(coor, idx[:, None, :], axis=2)
    new_x = jnp.take_along_axis(x, idx[:, None, :], axis=2)
    return new_coor, new_x


def fps_downsample_vn(coor, x, num_group):
    """VN variant (reference :203-223): features are (B, C, 3, N)."""
    b, c, _, n = x.shape
    idx = furthest_point_sample(coor.transpose(0, 2, 1), num_group)
    new_coor = jnp.take_along_axis(coor, idx[:, None, :], axis=2)
    new_x = jnp.take_along_axis(x, idx[:, None, None, :], axis=3)
    return new_coor, new_x


def _edge_scalar(coor_q, x_q, coor_k, x_k, k=16):
    """EdgeConv features with kNN in coordinate space (reference :96-119)."""
    _, idx = knn(coor_q.transpose(0, 2, 1), coor_k.transpose(0, 2, 1), k)
    return graph_feature(x_q, x_k, idx)  # (B, 2C, Nq, K)


def _edge_idx_planes(x, k=16, coords=None):
    """kNN indices for a plane-layout EdgeConv.

    Metric is euclidean over the flattened (3C,) feature vector (the
    reference's dynamic graph) unless explicit ``coords`` are given.  The
    kNN metric over the flattened vector is permutation-invariant, so the
    plane flatten gives the same neighbour sets as the reference's (C, 3)
    ordering.
    """
    if coords is None:
        b, _, c, n = x.shape
        flat = x.reshape(b, 3 * c, n).transpose(0, 2, 1)
        _, idx = knn(flat, flat, k)
    else:
        pts = coords.transpose(0, 2, 1)
        _, idx = knn(pts, pts, k)
    return idx


def _edge_vn_planes(x, k=16, coords=None):
    """Plane-layout VN EdgeConv features with flattened neighbour axis.

    x: (B, 3, C, N).  Returns (B, 3, 2C, N*K).
    """
    from vn_pointcloudcompletion_tpu.nn.precision import activation_dtype
    from vn_pointcloudcompletion_tpu.ops.knn import vn_graph_feature_planes

    idx = _edge_idx_planes(x, k, coords)
    # graph structure comes from the full-precision features above; under the
    # bf16 policy only the gathered edge tensor (and the conv chain it feeds,
    # which inherits its dtype) drops to bf16
    x = activation_dtype(x)
    return vn_graph_feature_planes(x, x, idx)


def edge_fused_enabled() -> bool:
    """Whether VN EdgeConv stages run the decomposed per-point-matmul path
    (``VNLinearLeakyReLU(edge_idx=...)``) instead of building the
    (B, 3, 2C, N*K) edge tensor.  ``VN_EDGE_FUSED`` ∈ {1, 0, auto}; auto
    engages on TPU, where the gather rides the MXU (ops/knn.gather_planes)."""
    mode = os.environ.get("VN_EDGE_FUSED", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    import jax

    return jax.default_backend() == "tpu"


def vn_edge_layer(x, out, name, k=16, coords=None, train=False):
    """One VN EdgeConv stage: dynamic-kNN graph -> VNLinearLeakyReLU ->
    mean pool over K.  x: (B, 3, C, N) -> (B, 3, out, N).

    Dispatches between the decomposed edge path and the reference
    composition (identical math and parameter tree — the decomposition
    moves the channel matmul before the gather; see nn/vn.py edge mode).
    The first layer (C < 16) always takes the reference path: its gather
    moves 3 floats per edge, so pre-transforming to ``out`` channels would
    inflate the gather instead of shrinking the matmul.
    """
    c, n = x.shape[2], x.shape[3]
    if c >= 16 and edge_fused_enabled():
        # edge_k: the layer builds the graph itself — on TPU the whole stage
        # front (kNN + gather + centre add) is one Pallas program; the layer
        # falls back to knn + edge_idx when the kernel is ineligible
        return VNLinearLeakyReLU(out, layout="plane", name=name)(
            x, train=train, edge_k=k, edge_coords=coords
        )
    f = _edge_vn_planes(x, k, coords)
    f = VNLinearLeakyReLU(out, layout="plane", name=name)(f, train=train)
    return _pool_edge_planes(f, n, k)


def _pool_edge_planes(f, n, k):
    """(B, 3, C, N*K) -> mean over K -> (B, 3, C, N)."""
    b, _, c, _ = f.shape
    acc = jnp.promote_types(f.dtype, jnp.float32)
    return f.reshape(b, 3, c, n, k).mean(axis=-1, dtype=acc).astype(f.dtype)


def scalar_edge_trunk(xyz, train: bool = False):
    """Shared scalar EdgeConv/FPS trunk: 3->8->32->64->64->128 channels over
    FPS 2048->512->128 (reference models/dgcnn.py:121-148 ==
    dgcnn_group.py:81-107).  Must be called inside an ``nn.compact`` __call__;
    layers attach to the caller's scope under the reference's layer names.
    Returns (coor (B, 3, 128), f (B, 128, 128))."""
    coor = xyz.transpose(0, 2, 1)  # (B, 3, N)
    f = ConvCh(8, name="input_trans")(coor)

    def layer(h, out, name):
        h = ConvCh(out, use_bias=False, name=f"{name}_conv")(h)
        h = GroupNormCh(4, name=f"{name}_gn")(h)
        h = nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=-1)  # over K

    f = layer(_edge_scalar(coor, f, coor, f), 32, "layer1")  # (B, 32, N)
    coor_q, f_q = fps_downsample_scalar(coor, f, 512)
    f = layer(_edge_scalar(coor_q, f_q, coor, f), 64, "layer2")
    coor = coor_q  # (B, 3, 512)
    f = layer(_edge_scalar(coor, f, coor, f), 64, "layer3")
    coor_q, f_q = fps_downsample_scalar(coor, f, 128)
    f = layer(_edge_scalar(coor_q, f_q, coor, f), 128, "layer4")  # (B, 128, 128)
    return coor_q, f


class DGCNNfps(nn.Module):
    """Scalar DGCNN encoder with FPS downsampling (reference :19-161)."""

    num_coarse: int = 1024
    latent_dim: int = 1024

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        nc = self.num_coarse // 2 if self.num_coarse == 448 else self.num_coarse
        b = xyz.shape[0]
        _, f = scalar_edge_trunk(xyz, train)

        g = ConvCh(1024, name="increase_dim_0")(f)
        g = BatchNormCh(name="increase_bn")(g, train=train)
        g = nn.leaky_relu(g, 0.2)
        g = ConvCh(1024, name="increase_dim_1")(g)
        feature_global = jnp.max(g, axis=-1)  # (B, 1024)

        h = nn.relu(DenseTorch(1024, name="coarse_pred_0")(feature_global))
        coarse = DenseTorch(3 * nc, name="coarse_pred_1")(h).reshape(b, nc, 3)

        if nc == 224:
            inp_sparse = fps(xyz, 224)
            coarse_cat = jnp.concatenate([coarse, inp_sparse], axis=1)
            return (coarse, coarse_cat), feature_global
        return coarse, feature_global


class VNDGCNNfps(nn.Module):
    """VN DGCNN encoder (reference :164-324).

    Returns vector-valued ``feature_global`` (B, 512, 3, 1) and coarse points
    predicted as vector channels by the ``conv7`` head.

    bf16-policy note: this trunk was briefly an f32 island after the
    8-category bf16 protocol run showed a chronic ~25% non-finite-gradient
    skip rate.  The actual hazard was the norm VJP at exactly-zero edge
    vectors (resample-pad makes exact duplicate points; under bf16
    near-duplicates cancel exactly too), which ``nn.vn.safe_norm`` now
    guards — with the guard, bf16 trunk gradients match the f32 island's
    magnitude on the deterministic repro (tests/test_precision.py) and
    real-data trajectories track; the island was removed to recover the
    ~17% train throughput it cost.  Note the island removal also moved FPS
    selection and kNN graph construction onto bf16-rounded coordinates (fps
    casts to f32 internally, but from already-rounded input) — sample/
    neighbour *selection* may differ from f32, not just the norm path.
    """

    num_coarse: int = 1024

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        from vn_pointcloudcompletion_tpu.nn.precision import activation_dtype

        nc = self.num_coarse // 2 if self.num_coarse == 448 else self.num_coarse
        b, n, _ = xyz.shape
        xyz = activation_dtype(xyz)
        coor = xyz.transpose(0, 2, 1)  # (B, 3, N)
        x = coor[:, :, None, :]  # plane layout (B, 3, 1, N)

        # dynamic graph on raw coords (first layer: feature space == coords)
        f = _edge_vn_planes(x, 16)  # (B, 3, 2, N*16)
        f = VNLinearLeakyReLU(32, layout="plane", name="conv1")(f, train=train)
        x1 = _pool_edge_planes(f, n, 16)  # (B, 3, 32, N)

        coor_q, f_q = fps_downsample_vn(coor, x1, 512)
        f = vn_edge_layer(f_q, 64, "conv4", coords=coor_q, train=train)
        f = vn_edge_layer(f, 128, "conv5", coords=coor_q, train=train)
        coor_q, f_q = fps_downsample_vn(coor_q, f, 128)
        f = vn_edge_layer(f_q, 512, "conv6", coords=coor_q, train=train)
        # (B, 3, 512, 128)

        gf_planes = VNMaxPool(layout="plane", name="pool5")(f)[..., None]
        h = VNLinearLeakyReLU(1024, layout="plane", name="conv7_0")(
            gf_planes, train=train
        )
        coarse = VNLinear(nc, layout="plane", name="conv7_1")(h)  # (B, 3, nc, 1)
        coarse = coarse[..., 0].transpose(0, 2, 1)  # (B, nc, 3)
        global_feature = jnp.swapaxes(gf_planes, 1, 2)

        if nc == 224:
            inp_sparse = fps(xyz, 224).astype(coarse.dtype)
            coarse_cat = jnp.concatenate([coarse, inp_sparse], axis=1)
            return (coarse, coarse_cat), global_feature
        return coarse, global_feature


class TransformNet(nn.Module):
    """DGCNN T-Net predicting a 3x3 alignment, identity-initialised
    (models/utils/transform_net.py:12-57)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, 6, N, K) edge features of raw coords
        b = x.shape[0]
        h = ConvCh(64, use_bias=False, name="conv1")(x)
        h = BatchNormCh(name="bn1")(h, train=train)
        h = nn.leaky_relu(h, 0.2)
        h = ConvCh(128, use_bias=False, name="conv2")(h)
        h = BatchNormCh(name="bn2")(h, train=train)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.max(h, axis=-1)  # over K -> (B, 128, N)
        h = ConvCh(1024, use_bias=False, name="conv3")(h)
        h = BatchNormCh(name="bn3")(h, train=train)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.max(h, axis=-1)  # (B, 1024)
        h = nn.leaky_relu(
            BatchNormCh(name="bn4")(DenseTorch(512, use_bias=False, name="linear1")(h), train=train),
            0.2,
        )
        h = nn.leaky_relu(
            BatchNormCh(name="bn5")(DenseTorch(256, use_bias=False, name="linear2")(h), train=train),
            0.2,
        )
        w = self.param("transform_kernel", nn.initializers.zeros, (256, 9))
        bias = self.param(
            "transform_bias",
            lambda key, shape: jnp.eye(3).reshape(9),
            (9,),
        )
        t = h @ w + bias
        return t.reshape(b, 3, 3)


class DGCNN(nn.Module):
    """Classic DGCNN with input T-Net, k=40 (reference :327-417).

    Coarse-only: the reference's dense branch uses undefined attributes
    (:404-417) and cannot run; parity is the working coarse path.
    """

    num_coarse: int = 448
    latent_dim: int = 1024
    n_knn: int = 40

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        b, n, _ = xyz.shape
        x = xyz.transpose(0, 2, 1)  # (B, 3, N)

        def graph(h):
            pts = h.transpose(0, 2, 1)
            _, idx = knn(pts, pts, self.n_knn)
            return graph_feature(h, h, idx)  # (B, 2C, N, K)

        x0 = graph(x)
        t = TransformNet(name="transform_net")(x0, train=train)
        x = jnp.einsum("bdn,bde->ben", x, t)  # x^T @ t, back to (B, 3, N)

        def conv_bn(h, out, name):
            h = ConvCh(out, use_bias=False, name=f"{name}_conv")(h)
            h = BatchNormCh(name=f"{name}_bn")(h, train=train)
            return nn.leaky_relu(h, 0.2)

        h = graph(x)
        h = conv_bn(h, 64, "conv1")
        h = conv_bn(h, 64, "conv2")
        x1 = jnp.max(h, axis=-1)

        h = graph(x1)
        h = conv_bn(h, 64, "conv3")
        h = conv_bn(h, 64, "conv4")
        x2 = jnp.max(h, axis=-1)

        h = graph(x2)
        h = conv_bn(h, 64, "conv5")
        x3 = jnp.max(h, axis=-1)

        h = jnp.concatenate([x1, x2, x3], axis=1)  # (B, 192, N)
        h = conv_bn(h, 1024, "conv6")
        feature_global = jnp.max(h, axis=-1)  # (B, 1024)

        m = nn.relu(DenseTorch(1024, name="mlp_0")(feature_global))
        m = nn.relu(DenseTorch(1024, name="mlp_1")(m))
        coarse = DenseTorch(3 * self.num_coarse, name="mlp_2")(m)
        return coarse.reshape(b, self.num_coarse, 3), feature_global
