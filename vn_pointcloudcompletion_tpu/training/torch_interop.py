"""Torch state_dict -> flax variables interop for reference checkpoints.

The reference saves plain ``model.state_dict()`` blobs (``train.py:255,268``)
and reloads encoder-only pretrains non-strict + frozen
(``models/model.py:29-39``).  This module maps those key names onto the
rebuild's flax tree so reference-pretrained weights are drop-in usable.

Covered: the flagship pipeline — ``VN_PointNet`` encoder
(``models/pcn.py:110-184``) and ``VN_FoldingNet`` decoder
(``models/pcn.py:319-389``).  Keys may carry the ``encoder.``/``decoder.``
prefixes of a full ``PCNNet`` state_dict or be bare submodule dicts.

The same mapping doubles as the full-pipeline numerical-parity harness
(tests/test_torch_parity.py::TestModelParity): transfuse reference weights,
require (coarse, fine) agreement end-to-end.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor / array-like -> float numpy copy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t).copy()


def _strip_prefix(sd: Mapping[str, object], prefix: str) -> Dict[str, object]:
    """Select keys under ``prefix.`` (or all keys if none carry it)."""
    pref = prefix + "."
    sub = {k[len(pref):]: v for k, v in sd.items() if k.startswith(pref)}
    return sub if sub else dict(sd)


def _vnllr(sd: Mapping[str, object], key: str) -> Tuple[dict, dict]:
    """Reference VNLinearLeakyReLU (vn_layers.py:46-74) -> flax params/stats."""
    params = {
        "kernel": _np(sd[f"{key}.map_to_feat.weight"]),
        "dir_kernel": _np(sd[f"{key}.map_to_dir.weight"]),
        "batchnorm": {
            "BatchNorm_0": {
                "scale": _np(sd[f"{key}.batchnorm.bn.weight"]),
                "bias": _np(sd[f"{key}.batchnorm.bn.bias"]),
            }
        },
    }
    stats = {
        "batchnorm": {
            "BatchNorm_0": {
                "mean": _np(sd[f"{key}.batchnorm.bn.running_mean"]),
                "var": _np(sd[f"{key}.batchnorm.bn.running_var"]),
            }
        }
    }
    return params, stats


def vn_pointnet_from_state_dict(sd: Mapping[str, object]) -> Tuple[dict, dict]:
    """Map a reference ``VN_PointNet`` state_dict onto the ``VNPointNet``
    flax subtree (params, batch_stats).  Key layout: models/pcn.py:132-162."""
    sd = _strip_prefix(sd, "encoder")
    fc0_p, fc0_s = _vnllr(sd, "first_conv.0")
    sc0_p, sc0_s = _vnllr(sd, "second_conv.0")
    trunk = {
        "first_conv_0": fc0_p,
        "first_conv_1": {"kernel": _np(sd["first_conv.1.map_to_feat.weight"])},
        "maxpool1": {"dir_kernel": _np(sd["maxpool1.map_to_dir.weight"])},
        "second_conv_0": sc0_p,
        "second_conv_1": {"kernel": _np(sd["second_conv.1.map_to_feat.weight"])},
        "maxpool2": {"dir_kernel": _np(sd["maxpool2.map_to_dir.weight"])},
        "mlp_0": {
            "linear": {"kernel": _np(sd["mlp.0.linear.map_to_feat.weight"])},
            "leaky_relu": {
                "dir_kernel": _np(sd["mlp.0.leaky_relu.map_to_dir.weight"])
            },
        },
        "mlp_1": {
            "linear": {"kernel": _np(sd["mlp.1.linear.map_to_feat.weight"])},
            "leaky_relu": {
                "dir_kernel": _np(sd["mlp.1.leaky_relu.map_to_dir.weight"])
            },
        },
        "mlp_2": {"kernel": _np(sd["mlp.2.map_to_feat.weight"])},
    }
    stats = {"trunk": {"first_conv_0": fc0_s, "second_conv_0": sc0_s}}
    return {"trunk": trunk}, stats


def vn_foldingnet_from_state_dict(
    sd: Mapping[str, object], latent_dim: int = 2048
) -> Tuple[dict, dict]:
    """Map a reference ``VN_FoldingNet`` state_dict onto the ``VNFoldingNet``
    flax subtree.  The first fold layer's single (out, latent+2) concat weight
    (models/pcn.py:335-336, columns [global | seed | point]) is split into the
    rebuild's per-source kernels (_VNSplitFoldLayer)."""
    sd = _strip_prefix(sd, "decoder")
    w = _np(sd["final_conv.0.map_to_feat.weight"])
    d = _np(sd["final_conv.0.map_to_dir.weight"])
    if w.shape[1] != latent_dim + 2:
        raise ValueError(
            f"final_conv.0 fan-in {w.shape[1]} != latent_dim+2 ({latent_dim + 2})"
        )
    fc1_p, fc1_s = _vnllr(sd, "final_conv.1")
    params = {
        "final_conv_0": {
            "kernel_global": w[:, :latent_dim],
            "kernel_seed": w[:, latent_dim : latent_dim + 1],
            "kernel_point": w[:, latent_dim + 1 :],
            "dir_kernel_global": d[:, :latent_dim],
            "dir_kernel_seed": d[:, latent_dim : latent_dim + 1],
            "dir_kernel_point": d[:, latent_dim + 1 :],
            "batchnorm": {
                "BatchNorm_0": {
                    "scale": _np(sd["final_conv.0.batchnorm.bn.weight"]),
                    "bias": _np(sd["final_conv.0.batchnorm.bn.bias"]),
                }
            },
        },
        "final_conv_1": fc1_p,
        "final_conv_2": {"kernel": _np(sd["final_conv.2.map_to_feat.weight"])},
    }
    stats = {
        "final_conv_0": {
            "batchnorm": {
                "BatchNorm_0": {
                    "mean": _np(sd["final_conv.0.batchnorm.bn.running_mean"]),
                    "var": _np(sd["final_conv.0.batchnorm.bn.running_var"]),
                }
            }
        },
        "final_conv_1": fc1_s,
    }
    return params, stats


_ENCODER_CONVERTERS = {"vn_pointnet": vn_pointnet_from_state_dict}


def encoder_variables_from_torch(
    sd: Mapping[str, object], enc_type: str = "vn_pointnet"
) -> Tuple[dict, dict]:
    """(params, batch_stats) for ``params['encoder']`` from a torch state_dict."""
    conv = _ENCODER_CONVERTERS.get(enc_type)
    if conv is None:
        raise NotImplementedError(
            f"torch .pth interop not implemented for enc_type={enc_type!r}; "
            f"supported: {sorted(_ENCODER_CONVERTERS)}"
        )
    return conv(sd)


def pcnnet_variables_from_torch(
    sd: Mapping[str, object],
    enc_type: str = "vn_pointnet",
    dec_type: str = "vn_foldingnet",
    latent_dim: int = 2048,
) -> dict:
    """Full flax ``variables`` dict for the flagship PCNNet from a reference
    ``PCNNet.state_dict()`` (keys prefixed ``encoder.``/``decoder.``)."""
    if (enc_type, dec_type) != ("vn_pointnet", "vn_foldingnet"):
        raise NotImplementedError(
            "full-model torch interop covers the flagship "
            "vn_pointnet+vn_foldingnet pipeline"
        )
    enc_p, enc_s = vn_pointnet_from_state_dict(sd)
    dec_p, dec_s = vn_foldingnet_from_state_dict(sd, latent_dim=latent_dim)
    return {
        "params": {"encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"encoder": enc_s, "decoder": dec_s},
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth`` state_dict to numpy (CPU, no CUDA required)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _np(v) for k, v in sd.items() if hasattr(v, "shape")}
