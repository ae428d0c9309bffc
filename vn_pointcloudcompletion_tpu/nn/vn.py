"""Vector Neuron layer zoo — rotation-equivariant modules on (B, C, 3, N, ...).

TPU-native rebuild of the reference zoo ``models/vn_layers.py:12-220`` as
flax modules.  Feature tensors carry vector-valued channels: axis 1 is the
channel axis C, axis 2 is the 3-vector coordinate axis, trailing axes are
spatial (points, neighbours).  Every channel-mixing map is a single einsum
over C — with the (3, N) trailing block flattened by XLA this is one MXU
contraction per layer, so the zoo compiles to dense matmul chains.

Numerical semantics (EPS, the leaky reflection formula, norm-BatchNorm) match
the reference exactly; see per-class citations.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6  # models/vn_layers.py:10


def edge_kernel_enabled() -> bool:
    """Whether ``edge_k`` EdgeConv stages run the whole-stage Pallas program
    (ops/knn_pallas.py::edge_knn_gather: kNN + gather + centre add in one
    kernel).  ``VN_EDGE_KERNEL`` ∈ {1, 0, auto}; auto engages on TPU only
    (=1 elsewhere runs the kernel in interpret mode, for tests)."""
    import os

    mode = os.environ.get("VN_EDGE_KERNEL", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    return jax.default_backend() == "tpu"


def safe_norm(x, axis, keepdims: bool = False):
    """L2 norm whose gradient is 0 (not NaN) at exactly-zero vectors.

    ``jnp.linalg.norm``'s VJP is x/|x| — 0/0 = NaN for an all-zero vector.
    Exact zeros DO occur in-graph: under the bf16 compute policy, edge
    features of near-duplicate points cancel exactly (the PCN loader
    duplicates points when resample-padding), and one zero vector NaNs the
    whole step's gradients (observed: ~40% of vn_dgcnn_fps train steps
    skipped on real data without this guard). The double-where keeps the
    backward finite; value is identical to jnp.linalg.norm. Matches the
    ``inv_pnorm`` guard in the Pallas backward kernels
    (ops/vn_fused.py::_bwd_kernel).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch ``nn.Linear(bias=False)`` default init: U(-1/sqrt(fan_in), +...).

    kaiming_uniform(a=sqrt(5)) on an (out, in) weight reduces to this bound;
    used so parity runs share the reference's init distribution.
    """
    fan_in = shape[-1]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init_fan(fan_in: int):
    """torch Linear init with an explicit fan-in.

    For split-kernel layers that decompose one concat matmul into parts: each
    part must draw from the bound of the ORIGINAL concatenated fan-in or the
    thin splits (fan-in 1) come out ~U(-1, 1), dominating the init.
    """
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _channel_linear(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply an (out, in) channel map over axis 1 of (B, C, ...).

    Under a bfloat16 compute scope, operands are cast to bf16 and the MXU
    accumulates in f32; the result is stored back in bf16 (activation
    bandwidth is the bottleneck, not matmul precision).
    """
    from vn_pointcloudcompletion_tpu.nn.precision import compute_dtype

    dt = compute_dtype()
    if dt == jnp.bfloat16:
        out = jnp.einsum(
            "oc,bc...->bo...", w.astype(dt), x.astype(dt),
            preferred_element_type=jnp.float32,
        )
        return out.astype(dt)
    return jnp.einsum("oc,bc...->bo...", w, x)


def _channel_linear_plane(w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Channel map over axis 2 of plane-layout (B, 3, C, N) tensors."""
    from vn_pointcloudcompletion_tpu.nn.precision import compute_dtype

    dt = compute_dtype()
    if dt == jnp.bfloat16:
        out = jnp.einsum(
            "oc,bjcn->bjon", w.astype(dt), x.astype(dt),
            preferred_element_type=jnp.float32,
        )
        return out.astype(dt)
    return jnp.einsum("oc,bjcn->bjon", w, x)


def to_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, 3, N) vec layout -> (B, 3, C, N) plane layout."""
    return jnp.swapaxes(x, 1, 2)


def from_planes(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, C, N) plane layout -> (B, C, 3, N) vec layout."""
    return jnp.swapaxes(x, 1, 2)


class VNLinear(nn.Module):
    """Channel-mixing linear on vector features (models/vn_layers.py:12-22).

    ``layout='plane'`` operates on (B, 3, C, N) coordinate planes (the
    TPU-friendly layout for hot chains); 'vec' is the reference (B, C, 3, N).
    """

    out_channels: int
    layout: str = "vec"

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[2] if self.layout == "plane" else x.shape[1]
        w = self.param("kernel", torch_linear_init, (self.out_channels, c_in))
        if self.layout == "plane":
            return _channel_linear_plane(w, x)
        return _channel_linear(w, x)


def _leaky_reflect(p, d, negative_slope):
    """The VN leaky ReLU nonlinearity (models/vn_layers.py:38-43).

    Keeps ``p`` where <p, d> >= 0, otherwise removes the component of ``p``
    along ``d``; blends with slope ``negative_slope``.
    """
    dotprod = jnp.sum(p * d, axis=2, keepdims=True)
    mask = (dotprod >= 0).astype(p.dtype)
    d_norm_sq = jnp.sum(d * d, axis=2, keepdims=True)
    reflected = p - (dotprod / (d_norm_sq + EPS)) * d
    return negative_slope * p + (1 - negative_slope) * (
        mask * p + (1 - mask) * reflected
    )


class VNLeakyReLU(nn.Module):
    """models/vn_layers.py:25-43 — learned direction, reflect negative half."""

    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        out = 1 if self.share_nonlinearity else x.shape[1]
        w = self.param("dir_kernel", torch_linear_init, (out, x.shape[1]))
        d = _channel_linear(w, x)
        return _leaky_reflect(x, d, self.negative_slope)


class VNBatchNorm(nn.Module):
    """BatchNorm on vector norms, rescaling vectors (models/vn_layers.py:107-127).

    One module covers the reference's dim-3/4/5 variants: flax BatchNorm
    normalises over every axis except the channel axis regardless of rank.
    """

    momentum: float = 0.9  # torch momentum=0.1 -> running = 0.9*old + 0.1*new
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        # statistics always in f32 (bf16 norms drift BN running stats)
        ct = jnp.promote_types(x.dtype, jnp.float32)
        norm = safe_norm(x.astype(ct), axis=2) + EPS  # (B, C, N...)
        c = norm.shape[1]
        # _NormAffine, not flax nn.BatchNorm: torch updates running_var with
        # the UNBIASED batch variance (flax uses biased), and the name keeps
        # the auto-named nn.BatchNorm tree for checkpoint compatibility
        a, b = _NormAffine(
            c, momentum=self.momentum, epsilon=self.epsilon,
            name="BatchNorm_0",
        )(norm, train)
        bshape = (1, c) + (1,) * (norm.ndim - 2)
        norm_bn = a.reshape(bshape) * norm + b.reshape(bshape)
        scale = (norm_bn / norm).astype(x.dtype)
        return x * scale[:, :, None]


class VNLayerNorm(nn.Module):
    """LayerNorm on vector norms over the channel axis (models/vn_layers.py:129-150)."""

    @nn.compact
    def __call__(self, x):
        # x: (B, C, 3, N); statistics in f32
        ct = jnp.promote_types(x.dtype, jnp.float32)
        norm = safe_norm(x.astype(ct), axis=2) + EPS  # (B, C, N)
        norm_t = norm.transpose(0, 2, 1)  # (B, N, C) — LN over C
        norm_l = nn.LayerNorm(epsilon=1e-5)(norm_t)  # torch LayerNorm eps
        norm_l = norm_l.transpose(0, 2, 1)  # (B, C, N)
        scale = (norm_l / norm).astype(x.dtype)
        return x * scale[:, :, None]


class _NormAffine(nn.Module):
    """BatchNorm-on-norms folded to per-channel affine (A, B).

    torch ``nn.BatchNorm1d/2d`` semantics (reference vn_layers.py:107-127):
    f32 stats, normalisation with the BIASED batch variance, running update
    with the UNBIASED one (factor n/(n-1) — flax's nn.BatchNorm uses biased
    for both, which drifts eval-after-resume from torch), update skipped at
    init.  Returns the folded coefficients ``norm_bn = A * norm + B``
    instead of applying them — the fused Pallas kernel applies them in one
    pass.  Parameter/stat names match ``nn.BatchNorm`` so the tree is
    identical across the fused/unfused paths and old checkpoints.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, norm, train: bool, moments=None, count=None):
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            if moments is not None:
                # caller provides (mean, biased var) — the fully-fused layer
                # path computes them from in-kernel partial sums — plus the
                # reduction element count for the unbiased running update
                mean, var = moments
                if count is None:
                    raise ValueError(
                        "moments= requires count= (reduction element count "
                        "for the unbiased running-var update)"
                    )
                cnt = count
            else:
                axes = (0,) + tuple(range(2, norm.ndim))
                mean = jnp.mean(norm, axis=axes)
                mean2 = jnp.mean(norm * norm, axis=axes)
                var = mean2 - mean * mean
                cnt = norm.size // c
            if not self.is_initializing():
                unbiased = var * (cnt / max(cnt - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum) * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        return a, bias - mean * a


class _FoldedBN(nn.Module):
    """Nesting shim so the fused path's stats share the unfused path's tree
    (``batchnorm/BatchNorm_0/...``, matching the auto-named nn.BatchNorm)."""

    features: int

    @nn.compact
    def __call__(self, norm, train: bool, moments=None, count=None):
        return _NormAffine(self.features, name="BatchNorm_0")(
            norm, train, moments=moments, count=count
        )


class VNLinearLeakyReLU(nn.Module):
    """Fused linear + norm-BatchNorm + leaky (models/vn_layers.py:46-74).

    Note the direction map reads the *input* ``x`` while the nonlinearity acts
    on the normalised output ``p`` — exactly the reference's wiring.

    ``layout='plane'`` runs on (B, 3, C, N) coordinate planes; there, for
    eligible shapes, the BN + leaky-reflect chain after the matmul runs as
    one fused Pallas pass (ops/vn_fused.py, ~3x over the XLA chain on v5e).
    ``fused`` forces the choice (None = auto: on for plane layout on TPU).
    Both paths and both layouts share one parameter tree.
    """

    out_channels: int
    share_nonlinearity: bool = False
    negative_slope: float = 0.2
    layout: str = "vec"
    fused: "bool | None" = None
    layer_fused: "bool | None" = None  # whole-layer Pallas op (matmul incl.)

    @nn.compact
    def __call__(
        self, x, train: bool = False, project_out=None, edge_idx=None,
        edge_k=None, edge_coords=None,
    ):
        """``project_out``: optional (1, C_out) kernel of a trailing
        1-channel VNLinear (owned by the CALLER's scope) — on the fused-layer
        path the contraction runs in-kernel so the (B, 3, C_out, N)
        activation never exists; otherwise it is applied after.

        ``edge_idx``: (B, Nq, K) kNN indices — EdgeConv mode (plane layout
        only).  ``x`` is then the PER-POINT feature (B, 3, C, N) and the
        layer computes the conv over ``concat([x[nbr] - x[q], x[q]])`` edge
        features followed by a mean pool over K, without ever building the
        (B, 3, 2C, Nq*K) edge tensor before the matmul: the conv is linear,
        so ``W @ concat(diff, ctr)`` = ``(W_diff @ x)[nbr] + ((W_ctr -
        W_diff) @ x)[q]`` — matmuls run per point (K-fold fewer FLOPs) and
        the gather moves post-matmul channels via :func:`ops.knn.gather_planes`.
        Parameter tree and math are identical to composing
        ``vn_graph_feature_planes`` + this layer + a K-mean
        (reference ``models/dgcnn.py:250-278`` + ``vn_layers.py:46-74``).

        ``edge_k``: EdgeConv mode with the kNN graph built IN the layer — on
        TPU the whole stage front (distances, k-extraction, gather, centre
        add) runs as one Pallas program (ops/knn_pallas.py::edge_knn_gather)
        so neither the indices, the one-hot operand, nor the distance matrix
        exist in HBM; elsewhere it falls back to knn + the edge_idx path.
        The metric is euclidean over ``edge_coords`` (B, 3, N) columns when
        given (fixed coordinate graph), else over the flattened features
        (the reference's dynamic graph)."""
        from vn_pointcloudcompletion_tpu.ops import vn_fused, vn_layer_fused

        if edge_idx is not None or edge_k is not None:
            from vn_pointcloudcompletion_tpu.ops import knn_pallas
            from vn_pointcloudcompletion_tpu.ops.knn import gather_planes, knn

            if self.layout != "plane":
                raise ValueError("edge mode requires plane layout")
            b, _, c, n = x.shape
            co = self.out_channels
            w = self.param("kernel", torch_linear_init, (co, 2 * c))
            d_out = 1 if self.share_nonlinearity else co
            wd = self.param("dir_kernel", torch_linear_init, (d_out, 2 * c))
            k = edge_idx.shape[2] if edge_idx is not None else edge_k
            # stack feature+direction maps: one per-point matmul, one gather
            w_diff = jnp.concatenate([w[:, :c], wd[:, :c]], axis=0)
            w_ctr = jnp.concatenate([w[:, c:], wd[:, c:]], axis=0)
            u = _channel_linear_plane(w_diff, x)  # (B, 3, Co+Do, N)
            v = _channel_linear_plane(w_ctr - w_diff, x)
            cpd = u.shape[2]
            use_kernel = (
                edge_idx is None
                and edge_kernel_enabled()
                and knn_pallas.edge_gather_eligible(
                    n, 3 if edge_coords is not None else 3 * c, k, 3 * cpd
                )
            )
            nq = n
            if use_kernel:
                xflat = (
                    edge_coords if edge_coords is not None
                    else x.reshape(b, 3 * c, n)
                )
                # graph structure from full precision, matching knn's cast
                pd4 = knn_pallas.edge_knn_gather(
                    xflat, u.reshape(b, 3 * cpd, n), v.reshape(b, 3 * cpd, n),
                    k, jax.default_backend() != "tpu",
                )  # (B, 3*Cpd, K, N)
                pd = pd4.reshape(b, 3, cpd, k * n)
                pool_kn = True  # edge axis order is (K, Nq)
            else:
                if edge_idx is None:
                    flat = (
                        edge_coords if edge_coords is not None
                        else x.reshape(b, 3 * c, n)
                    ).transpose(0, 2, 1)
                    _, edge_idx = knn(flat, flat, k)
                nq = edge_idx.shape[1]
                g = gather_planes(u, edge_idx)  # (B, 3, Co+Do, Nq*K)
                pd = g.reshape(b, 3, -1, nq, k) + v[:, :, :, :, None]
                pd = pd.reshape(b, 3, -1, nq * k)
                pool_kn = False  # edge axis order is (Nq, K)
            p, d = pd[:, :, :co], pd[:, :, co:]
            if self.share_nonlinearity:
                d = jnp.broadcast_to(d, p.shape)
            bn = _FoldedBN(co, name="batchnorm")
            if train:
                ct = jnp.promote_types(p.dtype, jnp.float32)
                norm = safe_norm(p.astype(ct), axis=1) + EPS
                a, b_ = bn(norm, True)
            else:
                a, b_ = bn(None, False)
            use_fused = self.fused
            if use_fused is None:
                use_fused = (
                    vn_fused.eligible(p) and jax.default_backend() == "tpu"
                )
            if use_fused and vn_fused.eligible(p):
                out = vn_fused.fused_bn_leaky(
                    p, d, a, b_, self.negative_slope,
                    jax.default_backend() != "tpu",
                )
            else:
                out = vn_fused.reference_bn_leaky_planes(
                    p, d, a, b_, self.negative_slope
                )
            if pool_kn:
                out = out.reshape(b, 3, co, k, nq).mean(axis=3)
            else:
                out = out.reshape(b, 3, co, nq, k).mean(axis=-1)
            if project_out is not None:
                out = _channel_linear_plane(project_out, out)
            return out
        if self.layout == "plane":
            c_in = x.shape[2]
            w = self.param("kernel", torch_linear_init, (self.out_channels, c_in))
            d_out = 1 if self.share_nonlinearity else self.out_channels
            wd = self.param("dir_kernel", torch_linear_init, (d_out, c_in))

            # bandwidth-bound layers (small channels, many points) run the
            # WHOLE layer — matmuls, BN stats, epilogue — as Pallas kernels
            # that never materialise the (B, 3, C, N) pre-activations
            use_layer = self.layer_fused
            if use_layer is None:
                # fused=False alone must pin the reference path: the
                # whole-layer kernel subsumes the epilogue fusion, so the
                # debugging escape hatch disables it too
                if self.fused is False:
                    use_layer = False
                else:
                    use_layer = (
                        jax.default_backend() == "tpu"
                        and vn_layer_fused.layer_eligible(
                            x, self.out_channels, self.share_nonlinearity
                        )
                    )
            if use_layer and vn_layer_fused.layer_eligible(
                x, self.out_channels, self.share_nonlinearity
            ):
                from vn_pointcloudcompletion_tpu.nn.precision import (
                    compute_dtype,
                )

                bf16 = compute_dtype() == jnp.bfloat16
                interpret = jax.default_backend() != "tpu"
                bn = _FoldedBN(self.out_channels, name="batchnorm")
                if train:
                    s1, s2 = vn_layer_fused.vn_layer_stats(
                        x, w, None, bf16, interpret
                    )
                    cnt = x.shape[0] * x.shape[3]
                    mean = s1 / cnt
                    var = s2 / cnt - mean * mean
                    a, b = bn(None, True, moments=(mean, var), count=cnt)
                else:
                    a, b = bn(None, False)
                if project_out is not None:
                    return vn_layer_fused.vn_layer_fused_project(
                        x, w, wd, None, None, a, b,
                        project_out.reshape(-1),
                        self.negative_slope, bf16, interpret,
                    )
                return vn_layer_fused.vn_layer_fused(
                    x, w, wd, None, None, a, b,
                    self.negative_slope, bf16, interpret,
                )
            # separate matmuls measure FASTER than one stacked (2C, Cin)
            # matmul here: slicing the stacked output breaks XLA's epilogue
            # fusion into the BN/leaky chain (v5e: +2ms on the trunk)
            p = _channel_linear_plane(w, x)
            d = _channel_linear_plane(wd, x)
            if self.share_nonlinearity:
                d = jnp.broadcast_to(d, p.shape)
            bn = _FoldedBN(self.out_channels, name="batchnorm")
            if train:
                ct = jnp.promote_types(p.dtype, jnp.float32)
                norm = safe_norm(p.astype(ct), axis=1) + EPS
                a, b = bn(norm, True)
            else:
                a, b = bn(None, False)
            use_fused = self.fused
            if use_fused is None:
                use_fused = (
                    vn_fused.eligible(p) and jax.default_backend() == "tpu"
                )
            if use_fused and vn_fused.eligible(p):
                interpret = jax.default_backend() != "tpu"
                out = vn_fused.fused_bn_leaky(
                    p, d, a, b, self.negative_slope, interpret
                )
            else:
                out = vn_fused.reference_bn_leaky_planes(
                    p, d, a, b, self.negative_slope
                )
            if project_out is not None:
                out = _channel_linear_plane(project_out, out)
            return out

        c_in = x.shape[1]
        w = self.param("kernel", torch_linear_init, (self.out_channels, c_in))
        d_out = 1 if self.share_nonlinearity else self.out_channels
        wd = self.param("dir_kernel", torch_linear_init, (d_out, c_in))
        # one fused matmul for the feature and direction maps: reads the
        # (large) input activation once instead of twice
        pd = _channel_linear(jnp.concatenate([w, wd], axis=0), x)
        p, d = pd[:, : self.out_channels], pd[:, self.out_channels :]
        p = VNBatchNorm(name="batchnorm")(p, train=train)
        out = _leaky_reflect(p, d, self.negative_slope)
        if project_out is not None:
            out = _channel_linear(project_out, out)
        return out


class VNLinearAndLeakyReLU(nn.Module):
    """Composition: linear -> optional BN -> VNLeakyReLU (models/vn_layers.py:77-104)."""

    out_channels: int
    share_nonlinearity: bool = False
    use_batchnorm: str = "norm"  # 'norm' | 'none'
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VNLinear(self.out_channels, name="linear")(x)
        if self.use_batchnorm != "none":
            x = VNBatchNorm(name="batchnorm")(x, train=train)
        return VNLeakyReLU(
            self.share_nonlinearity, self.negative_slope, name="leaky_relu"
        )(x)


class VNMaxPool(nn.Module):
    """Pool over the last axis by argmax of a learned projection
    (models/vn_layers.py:153-167).  Rank-generic like the reference's
    meshgrid gather: (B, C, 3, N) -> (B, C, 3) and
    (B, C, 3, N, K) -> (B, C, 3, N).  Gradient flows only through the
    selected vectors (take_along_axis semantics).
    """

    layout: str = "vec"

    @nn.compact
    def __call__(self, x):
        if self.layout == "plane":
            # x: (B, 3, C, N) -> (B, 3, C)
            c = x.shape[2]
            w = self.param("dir_kernel", torch_linear_init, (c, c))
            d = _channel_linear_plane(w, x)
            dotprod = jnp.sum(x * d, axis=1, keepdims=True)  # (B, 1, C, N)
            idx = jnp.argmax(dotprod, axis=-1, keepdims=True)  # (B, 1, C, 1)
            idx = jnp.broadcast_to(idx, x.shape[:-1] + (1,))
            return jnp.take_along_axis(x, idx, axis=-1)[..., 0]
        w = self.param("dir_kernel", torch_linear_init, (x.shape[1], x.shape[1]))
        d = _channel_linear(w, x)
        dotprod = jnp.sum(x * d, axis=2, keepdims=True)  # (B, C, 1, ..., L)
        idx = jnp.argmax(dotprod, axis=-1, keepdims=True)  # (B, C, 1, ..., 1)
        idx = jnp.broadcast_to(idx, x.shape[:-1] + (1,))
        return jnp.take_along_axis(x, idx, axis=-1)[..., 0]


def mean_pool(x, axis=-1, keepdims=False):
    """models/vn_layers.py:170-171."""
    return jnp.mean(x, axis=axis, keepdims=keepdims)


class VNStdFeature(nn.Module):
    """Learned invariant frame + invariant features (models/vn_layers.py:174-220)."""

    normalize_frame: bool = False
    share_nonlinearity: bool = False
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[1]
        z0 = VNLinearLeakyReLU(
            c // 2, self.share_nonlinearity, self.negative_slope, name="vn1"
        )(x, train=train)
        z0 = VNLinearLeakyReLU(
            c // 4, self.share_nonlinearity, self.negative_slope, name="vn2"
        )(z0, train=train)
        frame_ch = 2 if self.normalize_frame else 3
        w = self.param("frame_kernel", torch_linear_init, (frame_ch, c // 4))
        z0 = _channel_linear(w, z0)  # (B, frame_ch, 3, ...)

        if self.normalize_frame:
            v1 = z0[:, 0]  # (B, 3, ...)
            u1 = v1 / (safe_norm(v1, axis=1, keepdims=True) + EPS)
            v2 = z0[:, 1]
            v2 = v2 - jnp.sum(v2 * u1, axis=1, keepdims=True) * u1
            u2 = v2 / (safe_norm(v2, axis=1, keepdims=True) + EPS)
            u3 = jnp.cross(u1, u2, axis=1)
            z0 = jnp.stack([u1, u2, u3], axis=1)

        # x_std[b, i, k, ...] = sum_j x[b, i, j, ...] * z0[b, k, j, ...]
        x_std = jnp.einsum("bij...,bkj...->bik...", x, z0)
        # returned frame uses the reference's transposed layout (B, 3, frame_ch, ...)
        return x_std, jnp.swapaxes(z0, 1, 2)
