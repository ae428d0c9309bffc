"""Scalar building blocks shared by the model zoo.

Channel-first (B, C, N[, K]) helpers mirroring the torch layers the reference
composes (Conv1d/Conv2d with kernel 1 == per-point dense; BatchNorm1d/2d;
GroupNorm).  Kernel-size-1 convs are written as channel einsums so XLA lowers
them to plain MXU matmuls over the flattened spatial block.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.nn.vn import torch_linear_init


class ConvCh(nn.Module):
    """Kernel-1 convolution over the channel axis of (B, C, ...)."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from vn_pointcloudcompletion_tpu.nn.vn import _channel_linear

        from vn_pointcloudcompletion_tpu.nn.vn import torch_linear_init_fan

        c_in = x.shape[1]
        w = self.param("kernel", torch_linear_init, (self.out_channels, c_in))
        y = _channel_linear(w, x)
        if self.use_bias:
            b = self.param(
                "bias", torch_linear_init_fan(c_in), (self.out_channels,)
            )
            extra = (1,) * (y.ndim - 2)
            y = y + b.reshape((1, self.out_channels) + extra).astype(y.dtype)
        return y


class BatchNormCh(nn.Module):
    """BatchNorm over channel axis 1 (torch BatchNorm1d/2d defaults)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis=1,
        )(x)


class GroupNormCh(nn.Module):
    """GroupNorm over channel axis 1 of (B, C, ...) (torch GroupNorm defaults)."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, c = x.shape[:2]
        spatial = x.shape[2:]
        g = self.num_groups
        xg = x.reshape((b, g, c // g) + spatial).astype(
        jnp.promote_types(x.dtype, jnp.float32))
        axes = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        xn = xg.reshape(x.shape).astype(x.dtype)
        shape = (1, c) + (1,) * len(spatial)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return xn * scale.reshape(shape) + bias.reshape(shape)


class DenseTorch(nn.Module):
    """torch-initialised Dense over the last axis."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from vn_pointcloudcompletion_tpu.nn.vn import torch_linear_init_fan

        fan_in = x.shape[-1]
        w = self.param("kernel", torch_linear_init, (self.features, fan_in))
        y = jnp.einsum("...c,oc->...o", x, w)
        if self.use_bias:
            b = self.param("bias", torch_linear_init_fan(fan_in), (self.features,))
            y = y + b
        return y
