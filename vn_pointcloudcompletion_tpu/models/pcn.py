"""PCN-family encoders and FoldingNet-family decoders.

TPU-native rebuild of ``models/pcn.py`` from the reference:

- ``PCN``                 <- reference :186-273 (classic scalar PCN, full model)
- ``VNPCN``               <- reference :11-108  (VN PCN; dense path is broken
                             upstream — see class docstring)
- ``VNPointNet``          <- reference :110-184 (VN encoder used by the best
                             pretrained pipeline)
- ``FoldingNet``          <- reference :275-317
- ``VNFoldingNet``        <- reference :319-389 (seed rotated under rotation aug)
- ``AttentionVNFoldingNet`` <- reference :392-520 (PoinTr-style two-stage fold)

Encoders take ``xyz`` (B, N, 3) and return ``(coarse, feature_global)``;
decoders take ``(coarse, feature_global, rot)`` and return the dense cloud.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vn_pointcloudcompletion_tpu.models.common import BatchNormCh, ConvCh, DenseTorch
from vn_pointcloudcompletion_tpu.nn.attention import VNBlock, to_vn
from vn_pointcloudcompletion_tpu.nn.precision import activation_dtype
from vn_pointcloudcompletion_tpu.nn.vn import (
    VNLinear,
    VNLinearAndLeakyReLU,
    VNLinearLeakyReLU,
    VNMaxPool,
    safe_norm,
)
from vn_pointcloudcompletion_tpu.ops.fps import fps
from vn_pointcloudcompletion_tpu.ops.grid import folding_grid_2d, folding_grid_3d
from vn_pointcloudcompletion_tpu.ops.rotations import rotate_points


class _VNSplitFoldLayer(nn.Module):
    """First VN fold layer with the channel-concat matmul split by source.

    Mathematically identical to ``VNLinearLeakyReLU`` applied to
    ``concat([glob, seed, point])`` (the reference's final_conv layer 1,
    ``models/pcn.py:335-346``), but the global-feature contribution —
    identical for all ``num_dense`` points — is contracted once per sample
    and broadcast, instead of materialising a (B, latent+2, 3, Nd) tensor.
    On TPU this removes ~99.9% of the layer's FLOPs and the single biggest
    activation of the whole model (403 MB/sample at 16384 points).
    """

    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, glob_planes, seed_planes, point_planes,
                 train: bool = False):
        # plane layout: glob (B, 3, Cg, 1); seed/point (B, 3, 1, Nd)
        from vn_pointcloudcompletion_tpu.nn.vn import (
            EPS,
            _FoldedBN,
            _channel_linear_plane,
            torch_linear_init_fan,
        )
        from vn_pointcloudcompletion_tpu.ops import vn_fused

        cg = glob_planes.shape[2]
        # all split kernels draw from the concatenated fan-in (cg + 2) so the
        # init matches the reference's single Linear over the concat
        init = torch_linear_init_fan(cg + 2)
        wg = self.param("kernel_global", init, (self.out_channels, cg))
        ws = self.param("kernel_seed", init, (self.out_channels, 1))
        wp = self.param("kernel_point", init, (self.out_channels, 1))
        p = (
            _channel_linear_plane(wg, glob_planes)  # (B, 3, out, 1) — per sample
            + _channel_linear_plane(ws, seed_planes)
            + _channel_linear_plane(wp, point_planes)
        )
        dg = self.param("dir_kernel_global", init, (self.out_channels, cg))
        ds = self.param("dir_kernel_seed", init, (self.out_channels, 1))
        dp = self.param("dir_kernel_point", init, (self.out_channels, 1))
        d = (
            _channel_linear_plane(dg, glob_planes)
            + _channel_linear_plane(ds, seed_planes)
            + _channel_linear_plane(dp, point_planes)
        )
        bn = _FoldedBN(self.out_channels, name="batchnorm")
        if train:
            ct = jnp.promote_types(p.dtype, jnp.float32)
            norm = safe_norm(p.astype(ct), axis=1) + EPS
            a, b = bn(norm, True)
        else:
            a, b = bn(None, False)
        if vn_fused.eligible(p) and jax.default_backend() == "tpu":
            return vn_fused.fused_bn_leaky(p, d, a, b, self.negative_slope)
        return vn_fused.reference_bn_leaky_planes(p, d, a, b, self.negative_slope)


class _VNSplitFoldLayerFused(nn.Module):
    """_VNSplitFoldLayer on the whole-layer Pallas path (ops/vn_layer_fused).

    Same parameter tree and math: the rank-2 seed/point matmuls run in-kernel
    (C_in = 2) with the per-sample global contraction passed as a bias, so
    the (B, latent+2, 3, Nd)-sized pre-activations never exist in HBM —
    on top of the split-matmul trick this removes the remaining
    (B, 3, C, Nd) p/d round-trips and the BN-stats autodiff chain.
    """

    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, glob_planes, seed_planes, point_planes,
                 train: bool = False):
        from vn_pointcloudcompletion_tpu.nn.precision import compute_dtype
        from vn_pointcloudcompletion_tpu.nn.vn import (
            _FoldedBN,
            _channel_linear_plane,
            torch_linear_init_fan,
        )
        from vn_pointcloudcompletion_tpu.ops import vn_layer_fused

        cg = glob_planes.shape[2]
        init = torch_linear_init_fan(cg + 2)
        wg = self.param("kernel_global", init, (self.out_channels, cg))
        ws = self.param("kernel_seed", init, (self.out_channels, 1))
        wp = self.param("kernel_point", init, (self.out_channels, 1))
        dg = self.param("dir_kernel_global", init, (self.out_channels, cg))
        ds = self.param("dir_kernel_seed", init, (self.out_channels, 1))
        dp = self.param("dir_kernel_point", init, (self.out_channels, 1))

        pbias = _channel_linear_plane(wg, glob_planes)  # (B, 3, C, 1)
        dbias = _channel_linear_plane(dg, glob_planes)
        x2 = jnp.concatenate([seed_planes, point_planes], axis=2)  # (B,3,2,Nd)
        w2 = jnp.concatenate([ws, wp], axis=1)  # (C, 2)
        wd2 = jnp.concatenate([ds, dp], axis=1)

        bf16 = compute_dtype() == jnp.bfloat16
        interpret = jax.default_backend() != "tpu"
        bn = _FoldedBN(self.out_channels, name="batchnorm")
        if train:
            s1, s2 = vn_layer_fused.vn_layer_stats(
                x2, w2, pbias, bf16, interpret
            )
            cnt = x2.shape[0] * x2.shape[3]
            mean = s1 / cnt
            var = s2 / cnt - mean * mean
            a, b = bn(None, True, moments=(mean, var), count=cnt)
        else:
            a, b = bn(None, False)
        return vn_layer_fused.vn_layer_fused(
            x2, w2, wd2, pbias, dbias, a, b,
            self.negative_slope, bf16, interpret,
        )


class _ScalarSplitFoldLayer(nn.Module):
    """Scalar analogue for FoldingNet/PCN's first final_conv layer:
    Conv1d over concat([glob, seed, point]) with the global part contracted
    once per sample.  glob: (B, Cg), seed: (B, 2, Nd), point: (B, 3, Nd)."""

    out_channels: int

    @nn.compact
    def __call__(self, glob, seed, point):
        from vn_pointcloudcompletion_tpu.nn.vn import torch_linear_init_fan

        cg = glob.shape[1]
        init = torch_linear_init_fan(cg + 5)  # concat fan-in, see class above
        wg = self.param("kernel_global", init, (self.out_channels, cg))
        ws = self.param("kernel_seed", init, (self.out_channels, 2))
        wp = self.param("kernel_point", init, (self.out_channels, 3))
        b = self.param("bias", init, (self.out_channels,))
        out = (
            (glob @ wg.T)[:, :, None]  # (B, out, 1)
            + jnp.einsum("oc,bcn->bon", ws, seed)
            + jnp.einsum("oc,bcn->bon", wp, point)
            + b[None, :, None]
        )
        return out


class _VNSplitPairFoldLayer(nn.Module):
    """Plane-layout VN fold layer over [varying-seed | constant-feature] input.

    The attention decoder folds a grid of S points around each of N centres;
    the 384-channel centre feature is identical across the grid, so its matmul
    contribution is contracted once per centre (B, 3, C, N) and broadcast —
    a 16x FLOP cut on the layer — while the 1-channel varying input (seed or
    previous fold) is mapped per (centre, grid) point.  Equivalent to
    ``VNLinearLeakyReLU(concat([var, feat]))`` (reference models/pcn.py:450-460).
    """

    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, feat, var, s: int, train: bool = False):
        # feat: (B, 3, Cf, N); var: (B, 3, 1, N*S)
        from vn_pointcloudcompletion_tpu.nn.vn import (
            EPS,
            _FoldedBN,
            _channel_linear_plane,
            torch_linear_init_fan,
        )
        from vn_pointcloudcompletion_tpu.ops import vn_fused

        b, _, cf, n = feat.shape
        ns = n * s
        init = torch_linear_init_fan(cf + 1)  # concat fan-in
        wv = self.param("kernel_var", init, (self.out_channels, 1))
        wf = self.param("kernel_feat", init, (self.out_channels, cf))
        dv = self.param("dir_kernel_var", init, (self.out_channels, 1))
        df = self.param("dir_kernel_feat", init, (self.out_channels, cf))

        def expand(per_center):
            # (B, 3, out, N) -> (B, 3, out, N*S)
            e = jnp.broadcast_to(
                per_center[..., None], per_center.shape + (s,)
            )
            return e.reshape(b, 3, self.out_channels, ns)

        p = expand(_channel_linear_plane(wf, feat)) + _channel_linear_plane(wv, var)
        d = expand(_channel_linear_plane(df, feat)) + _channel_linear_plane(dv, var)
        bn = _FoldedBN(self.out_channels, name="batchnorm")
        if train:
            ct = jnp.promote_types(p.dtype, jnp.float32)
            norm = safe_norm(p.astype(ct), axis=1) + EPS
            a, bb = bn(norm, True)
        else:
            a, bb = bn(None, False)
        if vn_fused.eligible(p) and jax.default_backend() == "tpu":
            return vn_fused.fused_bn_leaky(p, d, a, bb, self.negative_slope)
        return vn_fused.reference_bn_leaky_planes(p, d, a, bb, self.negative_slope)


class _VNSplitPairFoldLayerFused(nn.Module):
    """_VNSplitPairFoldLayer on the whole-layer Pallas path (group bias).

    Same parameter tree and math: the per-centre feature contraction
    (B, 3, C, N) rides as a ``group=S`` bias expanded in-register, the
    1-channel varying input is the in-kernel matmul — the expanded
    (B, 3, C, N*S) pre-activations never exist in HBM.
    """

    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, feat, var, s: int, train: bool = False):
        from vn_pointcloudcompletion_tpu.nn.precision import compute_dtype
        from vn_pointcloudcompletion_tpu.nn.vn import (
            _FoldedBN,
            _channel_linear_plane,
            torch_linear_init_fan,
        )
        from vn_pointcloudcompletion_tpu.ops import vn_layer_fused

        b, _, cf, n = feat.shape
        ns = n * s
        init = torch_linear_init_fan(cf + 1)  # concat fan-in
        wv = self.param("kernel_var", init, (self.out_channels, 1))
        wf = self.param("kernel_feat", init, (self.out_channels, cf))
        dv = self.param("dir_kernel_var", init, (self.out_channels, 1))
        df = self.param("dir_kernel_feat", init, (self.out_channels, cf))

        pbias = _channel_linear_plane(wf, feat)  # (B, 3, C, N) per centre
        dbias = _channel_linear_plane(df, feat)

        bf16 = compute_dtype() == jnp.bfloat16
        interpret = jax.default_backend() != "tpu"
        bn = _FoldedBN(self.out_channels, name="batchnorm")
        if train:
            s1, s2 = vn_layer_fused.vn_layer_stats(
                var, wv, pbias, bf16, interpret, s
            )
            cnt = b * ns
            mean = s1 / cnt
            var_m = s2 / cnt - mean * mean
            a, bb = bn(None, True, moments=(mean, var_m), count=cnt)
        else:
            a, bb = bn(None, False)
        return vn_layer_fused.vn_layer_fused(
            var, wv, dv, pbias, dbias, a, bb,
            self.negative_slope, bf16, interpret, s,
        )


def _pair_fold_cls(s: int, ns: int):
    """Pick the Pallas whole-layer path when the shape supports it."""
    from vn_pointcloudcompletion_tpu.ops.vn_layer_fused import TN

    if jax.default_backend() == "tpu" and ns >= 4096 and TN % s == 0:
        return _VNSplitPairFoldLayerFused
    return _VNSplitPairFoldLayer


def _dense_layout(coarse: jnp.ndarray, grid_size: int):
    """Tile each coarse point over its fold grid, reference ordering.

    coarse (B, Nc, 3) -> point_feat (B, 3, Nc * S) with S = grid_size**2,
    seeds repeat per coarse point (``models/pcn.py:262-266``).
    """
    b, nc, _ = coarse.shape
    s = grid_size * grid_size
    point_feat = jnp.broadcast_to(coarse[:, :, None, :], (b, nc, s, 3))
    return point_feat.reshape(b, nc * s, 3).transpose(0, 2, 1)


class PCN(nn.Module):
    """Classic scalar PCN (reference ``models/pcn.py:186-273``)."""

    num_dense: int = 16384
    latent_dim: int = 1024
    grid_size: int = 4
    only_coarse: bool = False

    @nn.compact
    def __call__(self, xyz, rot=None, train: bool = False):
        b, n, _ = xyz.shape
        num_coarse = self.num_dense // (self.grid_size**2)
        x = xyz.transpose(0, 2, 1)  # (B, 3, N)

        f = ConvCh(128, name="first_conv_0")(x)
        f = BatchNormCh(name="first_bn")(f, train=train)
        f = nn.relu(f)
        f = ConvCh(256, name="first_conv_1")(f)
        g = jnp.max(f, axis=2, keepdims=True)  # (B, 256, 1)
        f = jnp.concatenate([jnp.broadcast_to(g, f.shape), f], axis=1)
        f = ConvCh(512, name="second_conv_0")(f)
        f = BatchNormCh(name="second_bn")(f, train=train)
        f = nn.relu(f)
        f = ConvCh(self.latent_dim, name="second_conv_1")(f)
        feature_global = jnp.max(f, axis=2)  # (B, latent)

        h = nn.relu(DenseTorch(1024, name="mlp_0")(feature_global))
        h = nn.relu(DenseTorch(1024, name="mlp_1")(h))
        coarse = DenseTorch(3 * num_coarse, name="mlp_2")(h).reshape(b, num_coarse, 3)

        if self.only_coarse:
            return coarse, None

        point_feat = _dense_layout(coarse, self.grid_size)  # (B, 3, Nd)
        seed = folding_grid_2d(self.grid_size)  # (2, S)
        seed = jnp.broadcast_to(
            seed[None, :, None, :], (b, 2, num_coarse, self.grid_size**2)
        ).reshape(b, 2, self.num_dense)

        f = _ScalarSplitFoldLayer(512, name="final_conv_0")(
            feature_global, seed, point_feat
        )
        f = BatchNormCh(name="final_bn_0")(f, train=train)
        f = nn.relu(f)
        f = ConvCh(512, name="final_conv_1")(f)
        f = BatchNormCh(name="final_bn_1")(f, train=train)
        f = nn.relu(f)
        f = ConvCh(3, name="final_conv_2")(f)
        fine = f + point_feat
        return coarse, fine.transpose(0, 2, 1)


class _ParamHolder(nn.Module):
    """Declares one named parameter under its own scope — lets a parent fuse
    computations across module boundaries while keeping the parameter tree
    (and torch-interop/checkpoint key paths) identical to the unfused stack."""

    shape: tuple
    param_name: str = "kernel"

    @nn.compact
    def __call__(self):
        from vn_pointcloudcompletion_tpu.nn.vn import torch_linear_init

        return self.param(self.param_name, torch_linear_init, self.shape)


def _linear_maxpool_planes(w, wd, x):
    """Fused VNLinear + VNMaxPool on plane layout (B, 3, Cin, N).

    The pool's learned direction reads the linear's output: d = Wd (W x) =
    (Wd W) x, so the direction map is precomposed — fan-in Cin instead of
    Cout halves its FLOPs (maxpool2: 825 -> 412 GFLOP/step at batch 16).
    Kept as SEPARATE matmuls: a stacked [W; WdW] matmul measures ~6 ms
    slower on v5e (slicing the output breaks epilogue fusion).  Exactly the
    reference semantics (vn_layers.py:153-167 after :12-22); Wd gets no
    gradient either way (argmax selection is non-differentiable, as in the
    reference).
    """
    from vn_pointcloudcompletion_tpu.nn.precision import compute_dtype
    from vn_pointcloudcompletion_tpu.nn.vn import _channel_linear_plane

    if compute_dtype() == jnp.bfloat16:
        # the composed map is consumed as bf16 by the channel matmul anyway,
        # so compose on the fast bf16 MXU path (f32 accumulation); the f32
        # compose was a 34 GFLOP f32 matmul on every step
        wdc = jax.lax.stop_gradient(
            jax.lax.dot_general(
                wd.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    else:
        wdc = jax.lax.stop_gradient(wd @ w)  # (Cout, Cin), f32 composition
    f = _channel_linear_plane(w, x)  # (B, 3, Cout, N)
    d = _channel_linear_plane(wdc, x)
    dot = jnp.sum(f * d, axis=1, keepdims=True)  # (B, 1, Cout, N)
    idx = jnp.argmax(dot, axis=-1, keepdims=True)
    idx = jnp.broadcast_to(idx, f.shape[:-1] + (1,))
    pooled = jnp.take_along_axis(f, idx, axis=-1)[..., 0]  # (B, 3, Cout)
    return f, pooled


class _VNPointNetTrunk(nn.Module):
    """Shared VN-PCN encoder trunk (reference ``models/pcn.py:35-65,132-162``)."""

    latent_dim: int = 1024
    num_coarse: int = 1024

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        b, n, _ = xyz.shape
        # hot path in plane layout (B, 3, C, N); the tiny N=1 mlp tail and the
        # public feature_global contract stay in vec layout (B, C, 3, 1)
        x = xyz.transpose(0, 2, 1)[:, :, None, :]  # (B, 3, 1, N)

        f = VNLinearLeakyReLU(128, layout="plane", name="first_conv_0")(
            x, train=train
        )
        # linear + maxpool pairs run as one fused stacked matmul each; the
        # _ParamHolder scoping keeps the VNLinear/VNMaxPool tree unchanged
        w1 = _ParamHolder((512, 128), name="first_conv_1")()
        wd1 = _ParamHolder((512, 512), "dir_kernel", name="maxpool1")()
        f, g = _linear_maxpool_planes(w1, wd1, f)  # (B,3,512,N), (B,3,512)
        g = g[..., None]
        f = jnp.concatenate(
            [jnp.broadcast_to(g, (b, 3, 512, n)), f], axis=2
        )  # (B, 3, 1024, N)
        f = VNLinearLeakyReLU(1024, layout="plane", name="second_conv_0")(
            f, train=train
        )
        w2 = _ParamHolder((self.latent_dim * 2, 1024), name="second_conv_1")()
        wd2 = _ParamHolder(
            (self.latent_dim * 2, self.latent_dim * 2), "dir_kernel",
            name="maxpool2",
        )()
        _, fg_planes = _linear_maxpool_planes(w2, wd2, f)
        fg_planes = fg_planes[..., None]  # (B, 3, 2L, 1)
        feature_global = jnp.swapaxes(fg_planes, 1, 2)  # (B, 2L, 3, 1)

        h = VNLinearAndLeakyReLU(2048, use_batchnorm="none", name="mlp_0")(
            feature_global, train=train
        )
        h = VNLinearAndLeakyReLU(1024, use_batchnorm="none", name="mlp_1")(
            h, train=train
        )
        coarse = VNLinear(self.num_coarse, name="mlp_2")(h)  # (B, Nc, 3, 1)
        coarse = coarse.reshape(b, self.num_coarse, 3)
        return coarse, feature_global


class VNPointNet(nn.Module):
    """VN encoder for PCNNet (reference ``models/pcn.py:110-184``).

    With ``num_coarse == 448`` the encoder predicts 224 points and appends
    FPS(input, 224), returning ``((coarse_224, coarse_448), feature_global)``
    (reference :179-182).
    """

    num_coarse: int = 1024
    latent_dim: int = 1024  # reference default; feature_global gets 2x this

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        nc = self.num_coarse // 2 if self.num_coarse == 448 else self.num_coarse
        coarse, feature_global = _VNPointNetTrunk(
            self.latent_dim, nc, name="trunk"
        )(xyz, train=train)
        if nc == 224:
            inp_sparse = fps(xyz, 224)
            coarse_cat = jnp.concatenate([coarse, inp_sparse], axis=1)
            return (coarse, coarse_cat), feature_global
        return coarse, feature_global


class VNPCN(nn.Module):
    """Standalone VN-PCN (reference ``models/pcn.py:11-108``).

    The reference's dense path is broken upstream (its 5-D ``feature_global``
    hits a 3-arg ``expand`` at :103 and the scalar ``final_conv`` channel
    count never matches), so like the reference in practice this model is
    coarse-only; the dense pipeline lives in VNPointNet + VNFoldingNet.
    """

    num_dense: int = 16384
    latent_dim: int = 1024
    grid_size: int = 4
    only_coarse: bool = True

    @nn.compact
    def __call__(self, xyz, rot=None, train: bool = False):
        if not self.only_coarse:
            raise NotImplementedError(
                "VNPCN dense path is broken in the reference (models/pcn.py:97-108); "
                "use VNPointNet + VNFoldingNet via PCNNet instead"
            )
        coarse, feature_global = _VNPointNetTrunk(
            self.latent_dim, 1024, name="trunk"
        )(xyz, train=train)
        return coarse, feature_global


class FoldingNet(nn.Module):
    """Scalar folding decoder (reference ``models/pcn.py:275-317``).

    Expects ``feature_global`` flattened from a VN latent: channel count is
    2048*3 + 3 + 2 (reference :290).
    """

    num_coarse: int = 1024

    @nn.compact
    def __call__(self, coarse, feature_global, rot=None, train: bool = False):
        if self.num_coarse == 448:
            nc, grid_size = 224, 8
        else:
            nc, grid_size = self.num_coarse, 4
        num_dense = nc * grid_size**2  # 16384 at the reference's nc=1024
        b = coarse.shape[0]
        feature_global = feature_global.reshape(b, -1)

        point_feat = _dense_layout(coarse, grid_size)
        seed = folding_grid_2d(grid_size)
        seed = jnp.broadcast_to(
            seed[None, :, None, :], (b, 2, nc, grid_size**2)
        ).reshape(b, 2, num_dense)

        f = _ScalarSplitFoldLayer(512, name="final_conv_0")(
            feature_global, seed, point_feat
        )
        f = BatchNormCh(name="final_bn_0")(f, train=train)
        f = nn.relu(f)
        f = ConvCh(512, name="final_conv_1")(f)
        f = BatchNormCh(name="final_bn_1")(f, train=train)
        f = nn.relu(f)
        f = ConvCh(3, name="final_conv_2")(f)
        fine = f + point_feat
        return fine.transpose(0, 2, 1)


class VNFoldingNet(nn.Module):
    """VN folding decoder (reference ``models/pcn.py:319-389``).

    The 3-D folding seed (z=0 plane) is rotated by the augmentation rotation
    when present (reference :367-370) so the decoder stays consistent with the
    rotated encoder output.
    """

    num_coarse: int = 1024
    latent_dim: int = 2048

    @nn.compact
    def __call__(self, coarse, feature_global, rot=None, train: bool = False):
        if self.num_coarse == 448:
            nc, grid_size = 224, 8
        else:
            nc, grid_size = self.num_coarse, 4
        num_dense = nc * grid_size**2  # 16384 at the reference's nc=1024
        b = coarse.shape[0]
        s = grid_size * grid_size

        # the whole decoder runs in TPU-friendly plane layout (B, 3, C, N)
        seed = folding_grid_3d(grid_size)  # (3, S)
        if rot is not None:
            seed = rotate_points(seed.T, rot)  # (B, S, 3)
            seed = seed.transpose(0, 2, 1)[:, :, None]  # (B, 3, 1, S)
        else:
            seed = jnp.broadcast_to(seed[None, :, None], (b, 3, 1, s))

        # (B, 3, 1, Nc*S): for each coarse point, its grid of seeds
        seed = jnp.broadcast_to(seed[:, :, :, None, :], (b, 3, 1, nc, s))
        seed = seed.reshape(b, 3, 1, num_dense)

        point_feat = _dense_layout(coarse, grid_size)[:, :, None]  # (B, 3, 1, Nd)
        glob_planes = jnp.swapaxes(feature_global, 1, 2)  # (B, 3, latent, 1)
        # under the bf16 policy the whole fold chain (its Pallas layers
        # inherit x.dtype for every (B, 3, C, Nd) buffer) must not be
        # promoted to f32 by the f32 seed/coarse constants; the final
        # residual add below stays in the coarse points' full precision
        seed = activation_dtype(seed)
        glob_planes = activation_dtype(glob_planes)
        # split first layer: global latent contracted once per sample instead
        # of broadcasting a (B, latent+2, 3, Nd) concat (see _VNSplitFoldLayer)
        # On TPU at dense sizes the whole layer runs as Pallas kernels
        # (matmuls + BN stats + epilogue in-kernel, same parameter tree).
        split_cls = (
            _VNSplitFoldLayerFused
            if jax.default_backend() == "tpu" and num_dense >= 4096
            else _VNSplitFoldLayer
        )
        f = split_cls(256, name="final_conv_0")(
            glob_planes, seed, activation_dtype(point_feat), train=train
        )
        # final_conv_1's (B, 3, 256, Nd) output exists only to be contracted
        # by final_conv_2's 1-channel VNLinear: pass that kernel in so the
        # fused-layer path emits the projection directly (same param tree —
        # final_conv_2/kernel is declared by the holder below)
        w2 = _ParamHolder((1, 256), name="final_conv_2")()
        f = VNLinearLeakyReLU(256, layout="plane", name="final_conv_1")(
            f, train=train, project_out=w2
        )  # (B, 3, 1, Nd)
        fine = f.astype(point_feat.dtype) + point_feat
        return fine[:, :, 0].transpose(0, 2, 1)  # (B, Nd, 3)


class AttentionVNFoldingNet(nn.Module):
    """Transformer + two-stage VN fold (reference ``models/pcn.py:392-520``).

    Runs 2 VN blocks over per-centre features (global latent + repeated
    centre), then folds a [-1, 1] grid around each centre PoinTr-style:
    ``rebuild = relative_xyz + coarse`` (reference :491-492).

    Note: the reference's ``repeat_input_centers`` reshape (:466) scrambles
    the (N, 3) axes into channels; replicated verbatim for parity.
    """

    num_coarse: int = 1024
    latent_dim: int = 2048

    @nn.compact
    def __call__(self, coarse, feature_global, rot=None, train: bool = False,
                 center_feats=None):
        """``center_feats``: optional (B, N, 3C) refined per-centre features
        from the vn_pointr decoder stack (composer ``pointr_decoder=True``) —
        projected and added to the per-centre conditioning, the PoinTr-proper
        use of the transformer decoder's output."""
        b, n, _ = coarse.shape
        grid_size = 8 if self.num_coarse == 448 else 4
        s = grid_size * grid_size

        # (B, 384, N, 3) -> (B, 1152, N) — reference's exact (scrambling) reshape
        repeat_centers = jnp.broadcast_to(coarse[:, None], (b, 384, n, 3))
        repeat_centers = repeat_centers.reshape(b, 384 * 3, n).transpose(0, 2, 1)

        fg = VNLinear(384, name="downsize_global")(feature_global)  # (B, 384, 3, 1)
        fg = jnp.broadcast_to(fg, (b, 384, 3, n)).reshape(b, 1152, n).transpose(0, 2, 1)
        x = fg + repeat_centers  # (B, N, 1152) scalar layout
        if center_feats is not None:
            cf = VNLinear(384, name="query_proj")(to_vn(center_feats))
            x = x + cf.reshape(b, 1152, n).transpose(0, 2, 1)

        vn_x = to_vn(x)  # (B, 384, 3, N)
        for i in range(2):
            vn_x = VNBlock(
                channels=384, attn_channels=384, num_heads=8, qk_scale=1.0,
                name=f"transformer_{i}",
            )(vn_x, train=train)

        # fold per centre in plane layout: centre features (B, 3, 384, N) are
        # constant across the S grid points (split-matmul, _VNSplitPairFoldLayer)
        feat = activation_dtype(vn_x.transpose(0, 2, 1, 3))  # (B, 3, 384, N)
        seed = folding_grid_3d(grid_size, extent=1.0)  # (3, S)
        seed = jnp.broadcast_to(seed[None, :, None, None, :], (b, 3, 1, n, s))
        # bf16 policy: the seed's f32 would otherwise promote every fold
        # buffer (the fused layers inherit x.dtype); the residual add onto
        # the coarse centres below stays full precision
        seed = activation_dtype(seed.reshape(b, 3, 1, n * s))

        pair_cls = _pair_fold_cls(s, n * s)
        h = pair_cls(256, name="vn_folding1_0")(
            feat, seed, s, train=train
        )
        # trailing 1-channel contractions fold into the fused layer kernel
        # (same param tree; see VNFoldingNet's final_conv_2 note)
        wf1 = _ParamHolder((1, 128), name="vn_folding1_2")()
        fd1 = VNLinearLeakyReLU(128, layout="plane", name="vn_folding1_1")(
            h, train=train, project_out=wf1
        )  # (B, 3, 1, NS)

        h = pair_cls(256, name="vn_folding2_0")(
            feat, fd1, s, train=train
        )
        wf2 = _ParamHolder((1, 128), name="vn_folding2_2")()
        fd2 = VNLinearLeakyReLU(128, layout="plane", name="vn_folding2_1")(
            h, train=train, project_out=wf2
        )  # (B, 3, 1, NS)

        relative_xyz = fd2[:, :, 0].reshape(b, 3, n, s).transpose(0, 2, 1, 3)
        rebuild = relative_xyz.astype(coarse.dtype) + coarse[..., None]  # (B, N, 3, S)
        return rebuild.transpose(0, 1, 3, 2).reshape(b, n * s, 3)
