"""Numerical parity against the reference PyTorch implementation itself.

Imports the reference's torch-only modules (models/vn_layers.py,
models/utils/dgcnn_util.py) directly from /root/reference as oracles, copies
weights into the flax rebuild, and requires outputs to agree to float
tolerance.  This pins the semantics the SO(3)-equivariance tests cannot: EPS
placement, the leaky reflection formula, BN-on-norms, argmax pooling, and the
graph-feature gather layout.

Skipped when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

import importlib.util


def _load_ref_module(name, relpath):
    # direct file import bypasses the reference package __init__ (which pulls
    # in its CUDA-extension dependencies)
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_vn = _load_ref_module("ref_vn_layers", "models/vn_layers.py")
ref_dgcnn = _load_ref_module("ref_dgcnn_util", "models/utils/dgcnn_util.py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vn_pointcloudcompletion_tpu.nn import (  # noqa: E402
    VNBatchNorm,
    VNLayerNorm,
    VNLeakyReLU,
    VNLinear,
    VNLinearAndLeakyReLU,
    VNLinearLeakyReLU,
    VNMaxPool,
    VNStdFeature,
)
from vn_pointcloudcompletion_tpu.ops.knn import graph_feature, knn  # noqa: E402

ATOL = 1e-5


def t2n(t):
    # .copy() matters: jax CPU arrays may zero-copy the numpy view, and torch
    # BatchNorm mutates running stats in place
    return t.detach().cpu().numpy().copy()


def make_x(rng, shape=(2, 8, 3, 16)):
    return rng.standard_normal(shape).astype(np.float32)


class TestVNLayerParity:
    def test_vn_linear(self, rng):
        x = make_x(rng)
        ref = ref_vn.VNLinear(8, 12)
        out_ref = t2n(ref(torch.from_numpy(x)))
        mod = VNLinear(12)
        variables = {"params": {"kernel": jnp.asarray(t2n(ref.map_to_feat.weight))}}
        out = mod.apply(variables, x)
        np.testing.assert_allclose(out, out_ref, atol=ATOL)

    @pytest.mark.parametrize("share", [False, True])
    def test_vn_leaky_relu(self, rng, share):
        x = make_x(rng)
        ref = ref_vn.VNLeakyReLU(8, share_nonlinearity=share)
        out_ref = t2n(ref(torch.from_numpy(x)))
        mod = VNLeakyReLU(share_nonlinearity=share)
        variables = {
            "params": {"dir_kernel": jnp.asarray(t2n(ref.map_to_dir.weight))}
        }
        out = mod.apply(variables, x)
        np.testing.assert_allclose(out, out_ref, atol=ATOL)

    @pytest.mark.parametrize("dim", [4, 5])
    def test_vn_linear_leaky_relu_eval_and_train(self, rng, dim):
        shape = (2, 8, 3, 16) if dim == 4 else (2, 8, 3, 10, 4)
        x = make_x(rng, shape)
        ref = ref_vn.VNLinearLeakyReLU(8, 12, dim=dim)
        mod = VNLinearLeakyReLU(12)
        variables = {
            "params": {
                "kernel": jnp.asarray(t2n(ref.map_to_feat.weight)),
                "dir_kernel": jnp.asarray(t2n(ref.map_to_dir.weight)),
                "batchnorm": {
                    "BatchNorm_0": {
                        "scale": jnp.asarray(t2n(ref.batchnorm.bn.weight)),
                        "bias": jnp.asarray(t2n(ref.batchnorm.bn.bias)),
                    }
                },
            },
            "batch_stats": {
                "batchnorm": {
                    "BatchNorm_0": {
                        "mean": jnp.asarray(t2n(ref.batchnorm.bn.running_mean)),
                        "var": jnp.asarray(t2n(ref.batchnorm.bn.running_var)),
                    }
                }
            },
        }
        # eval mode (running stats)
        ref.eval()
        with torch.no_grad():
            out_ref = t2n(ref(torch.from_numpy(x)))
        out = mod.apply(variables, x, train=False)
        np.testing.assert_allclose(out, out_ref, atol=ATOL)

        # train mode (batch stats + running-stat update)
        ref.train()
        out_ref_t = t2n(ref(torch.from_numpy(x)))
        out_t, updated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(out_t, out_ref_t, atol=1e-4)
        np.testing.assert_allclose(
            updated["batch_stats"]["batchnorm"]["BatchNorm_0"]["mean"],
            t2n(ref.batchnorm.bn.running_mean),
            atol=1e-5,
        )

    def test_vn_batchnorm_running_var_semantics(self, rng):
        # torch uses unbiased variance for the running update; train-mode
        # outputs use biased batch variance — both must match.
        x = make_x(rng, (4, 6, 3, 32))
        ref = ref_vn.VNBatchNorm(6, dim=4)
        mod = VNBatchNorm()
        variables = {
            "params": {
                "BatchNorm_0": {
                    "scale": jnp.asarray(t2n(ref.bn.weight)),
                    "bias": jnp.asarray(t2n(ref.bn.bias)),
                }
            },
            "batch_stats": {
                "BatchNorm_0": {
                    "mean": jnp.asarray(t2n(ref.bn.running_mean)),
                    "var": jnp.asarray(t2n(ref.bn.running_var)),
                }
            },
        }
        ref.train()
        out_ref = t2n(ref(torch.from_numpy(x)))
        out, updated = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(out, out_ref, atol=1e-4)

    def test_vn_layernorm(self, rng):
        x = make_x(rng, (2, 8, 3, 16))
        ref = ref_vn.VNLayerNorm(8)
        ref.eval()
        with torch.no_grad():
            out_ref = t2n(ref(torch.from_numpy(x)))
        mod = VNLayerNorm()
        variables = {
            "params": {
                "LayerNorm_0": {
                    "scale": jnp.asarray(t2n(ref.layer_norm.weight)),
                    "bias": jnp.asarray(t2n(ref.layer_norm.bias)),
                }
            }
        }
        out = mod.apply(variables, x)
        np.testing.assert_allclose(out, out_ref, atol=ATOL)

    def test_vn_maxpool(self, rng):
        x = make_x(rng, (2, 8, 3, 16))
        ref = ref_vn.VNMaxPool(8)
        with torch.no_grad():
            out_ref = t2n(ref(torch.from_numpy(x)))
        mod = VNMaxPool()
        variables = {
            "params": {"dir_kernel": jnp.asarray(t2n(ref.map_to_dir.weight))}
        }
        out = mod.apply(variables, x)
        np.testing.assert_allclose(out, out_ref, atol=ATOL)

    @pytest.mark.parametrize("normalize_frame", [False, True])
    def test_vn_std_feature(self, rng, normalize_frame):
        x = make_x(rng, (2, 8, 3, 16))
        ref = ref_vn.VNStdFeature(8, dim=4, normalize_frame=normalize_frame)
        ref.eval()
        with torch.no_grad():
            std_ref, frame_ref = ref(torch.from_numpy(x))

        def bn_params(t_lin):
            return {
                "BatchNorm_0": {
                    "scale": jnp.asarray(t2n(t_lin.batchnorm.bn.weight)),
                    "bias": jnp.asarray(t2n(t_lin.batchnorm.bn.bias)),
                }
            }

        def bn_stats(t_lin):
            return {
                "BatchNorm_0": {
                    "mean": jnp.asarray(t2n(t_lin.batchnorm.bn.running_mean)),
                    "var": jnp.asarray(t2n(t_lin.batchnorm.bn.running_var)),
                }
            }

        mod = VNStdFeature(normalize_frame=normalize_frame)
        variables = {
            "params": {
                "vn1": {
                    "kernel": jnp.asarray(t2n(ref.vn1.map_to_feat.weight)),
                    "dir_kernel": jnp.asarray(t2n(ref.vn1.map_to_dir.weight)),
                    "batchnorm": bn_params(ref.vn1),
                },
                "vn2": {
                    "kernel": jnp.asarray(t2n(ref.vn2.map_to_feat.weight)),
                    "dir_kernel": jnp.asarray(t2n(ref.vn2.map_to_dir.weight)),
                    "batchnorm": bn_params(ref.vn2),
                },
                "frame_kernel": jnp.asarray(t2n(ref.vn_lin.weight)),
            },
            "batch_stats": {
                "vn1": {"batchnorm": bn_stats(ref.vn1)},
                "vn2": {"batchnorm": bn_stats(ref.vn2)},
            },
        }
        std, frame = mod.apply(variables, x, train=False)
        np.testing.assert_allclose(std, t2n(std_ref), atol=1e-4)
        np.testing.assert_allclose(frame, t2n(frame_ref), atol=1e-4)


class TestGraphFeatureParity:
    def test_knn_matches_dgcnn_util(self, rng):
        # ref_dgcnn.knn is the matmul+topk formulation (dgcnn_util.py:11-17)
        x = rng.standard_normal((2, 6, 20)).astype(np.float32)  # (B, C, N)
        k = 4
        idx_ref = t2n(ref_dgcnn.knn(torch.from_numpy(x), k=k))  # (B, N, K)
        pts = jnp.asarray(x).transpose(0, 2, 1)
        _, idx = knn(pts, pts, k)
        # same neighbour sets (ordering may differ on exact ties)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), axis=-1), np.sort(idx_ref, axis=-1)
        )

    def test_graph_feature_gather_layout(self, rng):
        # (the reference's get_graph_feature hardcodes a CUDA device at
        # dgcnn_util.py:24, so the gather itself is checked vs a numpy loop)
        x = rng.standard_normal((2, 6, 20)).astype(np.float32)
        k = 4
        pts = jnp.asarray(x).transpose(0, 2, 1)
        _, idx = knn(pts, pts, k)
        feat = np.asarray(graph_feature(jnp.asarray(x), jnp.asarray(x), idx))
        idx_np = np.asarray(idx)
        assert feat.shape == (2, 12, 20, k)
        for b in range(2):
            for n in range(20):
                for j in range(k):
                    nbr = x[b, :, idx_np[b, n, j]]
                    np.testing.assert_allclose(
                        feat[b, :6, n, j], nbr - x[b, :, n], atol=1e-6
                    )
                    np.testing.assert_allclose(feat[b, 6:, n, j], x[b, :, n],
                                               atol=1e-6)
