"""VN and scalar transformer blocks.

Rebuilds ``models/transformer.py`` (VN_Block / Attention used by the
attention decoder) and the block zoo of ``models/pointr/vn_pointr.py``
(Attention :112-145, CrossAttention :149-184, Block :328-364, DecoderBlock
:187-248, VN_Block :366-412, VN_DecoderBlock :250-326, Mlp :93-109).

Layout conventions: VN tensors are (B, C, 3, N); the "scalar layout"
(B, N, 3C) used between reference blocks flattens (C, 3) row-major —
``to_vn`` / ``to_scalar`` below are the exact reshape semantics of
``x.transpose(1,2).view(bs, -1, 3, n)`` and its inverse.

Dropout / drop-path are rate-0 in every reference instantiation, so they are
omitted.  All attention contractions run in bfloat16-friendly einsums with an
f32 softmax.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.nn.vn import (
    VNLayerNorm,
    VNLinear,
    VNLinearLeakyReLU,
    VNMaxPool,
    mean_pool,
)
from vn_pointcloudcompletion_tpu.ops.knn import vn_graph_feature, gather_neighbors


def to_vn(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3C) scalar layout -> (B, C, 3, N) VN layout."""
    b, n, c3 = x.shape
    return x.transpose(0, 2, 1).reshape(b, c3 // 3, 3, n)


def to_scalar(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, 3, N) VN layout -> (B, N, 3C) scalar layout."""
    b, c, _, n = x.shape
    return x.reshape(b, c * 3, n).transpose(0, 2, 1)


class VNAttention(nn.Module):
    """Per-head VN q/k/v projections, scalar dot-product over flattened vectors.

    Covers both reference variants: ``models/transformer.py:73-106``
    (proj C->C) and ``models/pointr/vn_pointr.py:112-145`` (proj 128->384).
    Default scale is ``(attn_channels // num_heads) ** -0.5`` — identical to
    both call sites' ``head_dim ** -0.5`` conventions.
    """

    attn_channels: int
    out_channels: int
    num_heads: int = 8
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, vn_x):
        b, c, _, n = vn_x.shape
        p, h = self.attn_channels, self.num_heads
        scale = self.qk_scale or (p // h) ** -0.5

        def split_heads(t):
            # (B, P, 3, N) -> (B, H, N, 3P/H)
            t = t.reshape(b, h, p // h, 3, n)
            return t.transpose(0, 1, 4, 2, 3).reshape(b, h, n, (p // h) * 3)

        q = split_heads(VNLinear(p, name="proj_vnq")(vn_x))
        k = split_heads(VNLinear(p, name="proj_vnk")(vn_x))
        v = split_heads(VNLinear(p, name="proj_vnv")(vn_x))

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)  # (B, H, N, 3P/H)
        # back to VN layout: (B, H, N, P/H, 3) -> (B, N, P, 3) -> (B, P, 3, N)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, p, 3).transpose(0, 2, 3, 1)
        return VNLinear(self.out_channels, name="proj_vn")(out)


class VNBlock(nn.Module):
    """Pre-norm VN transformer block with optional kNN edge fusion.

    ``models/transformer.py:25-71`` (channels = attn_channels = 384) and
    ``models/pointr/vn_pointr.py:366-412`` (channels=128, attn_channels=384).
    Operates in VN layout (B, C, 3, N); callers using the reference's scalar
    layout convert with to_vn/to_scalar.
    """

    channels: int
    attn_channels: int
    num_heads: int = 8
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, vn_x, knn_idx=None, train: bool = False):
        c = self.channels
        norm_x = VNLayerNorm(name="norm1")(vn_x)
        x_1 = VNAttention(
            self.attn_channels, c, self.num_heads, self.qk_scale, name="attn"
        )(norm_x)
        if knn_idx is not None:
            knn_f = vn_graph_feature(norm_x, norm_x, knn_idx)  # (B, 2C, 3, N, K)
            knn_f = VNLinearLeakyReLU(c, name="conv1")(knn_f, train=train)
            knn_f = mean_pool(knn_f)  # over K -> (B, C, 3, N)
            x_1 = jnp.concatenate([x_1, knn_f], axis=1)
            x_1 = VNLinear(c, name="conv2")(x_1)
        vn_x = vn_x + x_1
        norm_vn_x = VNLayerNorm(name="norm2")(vn_x)
        x_2 = VNLinearLeakyReLU(2 * c, name="conv3")(norm_vn_x, train=train)
        x_2 = VNLinearLeakyReLU(c, name="conv4")(x_2, train=train)
        return vn_x + x_2


class Mlp(nn.Module):
    """GELU MLP (models/pointr/vn_pointr.py:93-109)."""

    hidden_features: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, kernel_init=nn.initializers.truncated_normal(0.02))(x)
        x = jax.nn.gelu(x)
        return nn.Dense(self.out_features, kernel_init=nn.initializers.truncated_normal(0.02))(x)


class ScalarAttention(nn.Module):
    """Standard multi-head self-attention on (B, N, C) — the scalar path
    (qkv as separate fused dense; models/pointr/vn_pointr.py:112-123 scalar
    branch semantics via a single qkv Linear)."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        h = self.num_heads
        scale = self.qk_scale or (self.dim // h) ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, self.dim // h).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class CrossAttention(nn.Module):
    """Scalar cross-attention (models/pointr/vn_pointr.py:149-184)."""

    dim: int
    out_dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, q_in, v_in):
        b, n, _ = q_in.shape
        nk = v_in.shape[1]
        c, h = self.out_dim, self.num_heads
        scale = self.qk_scale or (c // h) ** -0.5
        q = nn.Dense(c, use_bias=self.qkv_bias, name="q_map")(q_in)
        k = nn.Dense(c, use_bias=self.qkv_bias, name="k_map")(v_in)
        v = nn.Dense(c, use_bias=self.qkv_bias, name="v_map")(v_in)
        q = q.reshape(b, n, h, c // h).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, h, c // h).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, h, c // h).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


def scalar_graph_feature(x, idx, x_q=None):
    """concat([neighbor - center, center]) on scalar features.

    x: (B, N, C) neighbour pool, idx: (B, Nq, K), x_q: optional (B, Nq, C).
    Returns (B, Nq, K, 2C) (the reference's ``get_graph_feature`` at
    vn_pointr.py:60-71, transposed to centre-major for take_along_axis).
    """
    nbr = gather_neighbors(x, idx)  # (B, Nq, K, C)
    ctr = x_q if x_q is not None else x
    ctr = jnp.broadcast_to(ctr[:, :, None, :], nbr.shape)
    return jnp.concatenate([nbr - ctr, ctr], axis=-1)


class Block(nn.Module):
    """Scalar PoinTr encoder block (models/pointr/vn_pointr.py:328-364)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, knn_idx=None):
        norm_x = nn.LayerNorm(name="norm1")(x)
        x_1 = ScalarAttention(
            self.dim, self.num_heads, self.qkv_bias, self.qk_scale, name="attn"
        )(norm_x)
        if knn_idx is not None:
            knn_f = scalar_graph_feature(norm_x, knn_idx)
            knn_f = nn.Dense(self.dim, name="knn_map")(knn_f)
            knn_f = nn.leaky_relu(knn_f, 0.2)
            knn_f = jnp.max(knn_f, axis=2)  # over K
            x_1 = jnp.concatenate([x_1, knn_f], axis=-1)
            x_1 = nn.Dense(self.dim, name="merge_map")(x_1)
        x = x + x_1
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(name="norm2")(x)
        )
        return x


class DecoderBlock(nn.Module):
    """Scalar PoinTr decoder block (models/pointr/vn_pointr.py:187-248)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, q, v, self_knn_idx=None, cross_knn_idx=None):
        norm_q = nn.LayerNorm(name="norm1")(q)
        q_1 = ScalarAttention(
            self.dim, self.num_heads, self.qkv_bias, self.qk_scale, name="self_attn"
        )(norm_q)
        if self_knn_idx is not None:
            knn_f = scalar_graph_feature(norm_q, self_knn_idx)
            knn_f = nn.leaky_relu(nn.Dense(self.dim, name="knn_map")(knn_f), 0.2)
            knn_f = jnp.max(knn_f, axis=2)
            q_1 = jnp.concatenate([q_1, knn_f], axis=-1)
            q_1 = nn.Dense(self.dim, name="merge_map")(q_1)
        q = q + q_1

        norm_q2 = nn.LayerNorm(name="norm_q")(q)
        norm_v = nn.LayerNorm(name="norm_v")(v)
        q_2 = CrossAttention(
            self.dim, self.dim, self.num_heads, self.qkv_bias, self.qk_scale,
            name="attn",
        )(norm_q2, norm_v)
        if cross_knn_idx is not None:
            knn_f = scalar_graph_feature(norm_v, cross_knn_idx, norm_q2)
            knn_f = nn.leaky_relu(nn.Dense(self.dim, name="knn_map_cross")(knn_f), 0.2)
            knn_f = jnp.max(knn_f, axis=2)
            q_2 = jnp.concatenate([q_2, knn_f], axis=-1)
            q_2 = nn.Dense(self.dim, name="merge_map_cross")(q_2)
        q = q + q_2
        q = q + Mlp(int(self.dim * self.mlp_ratio), self.dim, name="mlp")(
            nn.LayerNorm(name="norm2")(q)
        )
        return q


class VNDecoderBlock(nn.Module):
    """VN PoinTr decoder block (models/pointr/vn_pointr.py:250-326).

    NOTE: the reference's version of this block is unreachable dead code
    (model.py:23-24 always builds vn_pointr with only_coarse=True) and would
    crash if invoked (its scalar-shaped ``norm_q`` is fed to a VN-shaped
    Attention).  This implementation keeps its evident intent: scalar
    LayerNorms on (B, N, 3C) with VN attention/conv fusion via layout
    conversion.
    """

    channels: int = 128  # vector channels; scalar dim = 3 * channels
    attn_channels: int = 384
    num_heads: int = 4
    qk_scale: Optional[float] = None

    @nn.compact
    def __call__(self, q, v, self_knn_idx=None, cross_knn_idx=None, train: bool = False):
        c = self.channels
        norm_q = nn.LayerNorm(name="norm1")(q)  # (B, Nq, 3C)
        q_1 = VNAttention(
            self.attn_channels, c, self.num_heads, self.qk_scale, name="self_attn"
        )(to_vn(norm_q))
        if self_knn_idx is not None:
            vq = to_vn(norm_q)
            knn_f = vn_graph_feature(vq, vq, self_knn_idx)
            knn_f = VNLinearLeakyReLU(c, name="conv1")(knn_f, train=train)
            knn_f = VNMaxPool(name="pool1")(knn_f)  # over K
            q_1 = jnp.concatenate([q_1, knn_f], axis=1)
            q_1 = VNLinear(c, name="conv2")(q_1)
        q = q + to_scalar(q_1)

        norm_q2 = nn.LayerNorm(name="norm_q")(q)
        norm_v = nn.LayerNorm(name="norm_v")(v)
        q_2 = CrossAttention(
            3 * c, 3 * c, self.num_heads, qk_scale=self.qk_scale, name="attn"
        )(norm_q2, norm_v)
        q_2 = to_vn(q_2)
        if cross_knn_idx is not None:
            knn_f = vn_graph_feature(to_vn(norm_q2), to_vn(norm_v), cross_knn_idx)
            knn_f = VNLinearLeakyReLU(c, name="conv3")(knn_f, train=train)
            knn_f = VNMaxPool(name="pool2")(knn_f)  # over K
            q_2 = jnp.concatenate([q_2, knn_f], axis=1)
            q_2 = VNLinear(c, name="conv4")(q_2)
        q = q + to_scalar(q_2)
        return q
