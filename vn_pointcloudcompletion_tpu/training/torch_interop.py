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


def _conv(sd: Mapping[str, object], key: str, bias: bool = True) -> dict:
    """torch Conv1d/Conv2d kernel-1 weight (out, in, 1[, 1]) -> ConvCh."""
    w = _np(sd[f"{key}.weight"])
    out = {"kernel": w.reshape(w.shape[0], w.shape[1])}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _affine(sd: Mapping[str, object], key: str) -> dict:
    """GroupNorm / Linear-style weight+bias pair -> scale/bias leaves."""
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _bn(sd: Mapping[str, object], key: str) -> Tuple[dict, dict]:
    """torch BatchNorm1d/2d -> flax nn.BatchNorm (BatchNormCh) subtree."""
    params = {"BatchNorm_0": {"scale": _np(sd[f"{key}.weight"]),
                              "bias": _np(sd[f"{key}.bias"])}}
    stats = {"BatchNorm_0": {"mean": _np(sd[f"{key}.running_mean"]),
                             "var": _np(sd[f"{key}.running_var"])}}
    return params, stats


def _linear(sd: Mapping[str, object], key: str) -> dict:
    """torch nn.Linear -> DenseTorch ((out, in) kernel kept as stored)."""
    return {"kernel": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def dgcnn_fps_from_state_dict(sd: Mapping[str, object]) -> Tuple[dict, dict]:
    """Map a reference ``DGCNN_fps`` state_dict (models/dgcnn.py:19-74) onto
    the ``DGCNNfps`` flax subtree (params, batch_stats)."""
    sd = _strip_prefix(sd, "encoder")
    inc_bn_p, inc_bn_s = _bn(sd, "increase_dim.1")
    params = {
        "input_trans": _conv(sd, "input_trans"),
        "increase_dim_0": _conv(sd, "increase_dim.0"),
        "increase_bn": inc_bn_p,
        "increase_dim_1": _conv(sd, "increase_dim.3"),
        "coarse_pred_0": _linear(sd, "coarse_pred.0"),
        "coarse_pred_1": _linear(sd, "coarse_pred.2"),
    }
    for i in (1, 2, 3, 4):
        params[f"layer{i}_conv"] = _conv(sd, f"layer{i}.0", bias=False)
        params[f"layer{i}_gn"] = _affine(sd, f"layer{i}.1")
    return params, {"increase_bn": inc_bn_s}


def vn_dgcnn_fps_from_state_dict(sd: Mapping[str, object]) -> Tuple[dict, dict]:
    """Map a reference ``VN_DGCNN_fps`` state_dict (models/dgcnn.py:164-193)
    onto the ``VNDGCNNfps`` flax subtree."""
    sd = _strip_prefix(sd, "encoder")
    params, stats = {}, {}
    # conv1 is a one-element Sequential; conv4/5/6 are bare VNLinearLeakyReLU
    for flax_key, ref_key in (
        ("conv1", "conv1.0"), ("conv4", "conv4"), ("conv5", "conv5"),
        ("conv6", "conv6"), ("conv7_0", "conv7.0"),
    ):
        p, s = _vnllr(sd, ref_key)
        params[flax_key], stats[flax_key] = p, s
    params["conv7_1"] = {"kernel": _np(sd["conv7.1.map_to_feat.weight"])}
    params["pool5"] = {"dir_kernel": _np(sd["pool5.map_to_dir.weight"])}
    return params, stats


def _vnlalr(sd: Mapping[str, object], key: str) -> Tuple[dict, dict]:
    """Reference VNLinearAndLeakyReLU with use_batchnorm='norm'
    (vn_layers.py:77-104) -> flax subtree."""
    bn_p, bn_s = _bn(sd, f"{key}.batchnorm.bn")
    params = {
        "linear": {"kernel": _np(sd[f"{key}.linear.map_to_feat.weight"])},
        "leaky_relu": {
            "dir_kernel": _np(sd[f"{key}.leaky_relu.map_to_dir.weight"])
        },
        "batchnorm": bn_p,
    }
    return params, {"batchnorm": bn_s}


def _ln(sd: Mapping[str, object], key: str) -> dict:
    """Reference VNLayerNorm (vn_layers.py:129-150) -> flax LayerNorm."""
    return {"LayerNorm_0": {"scale": _np(sd[f"{key}.layer_norm.weight"]),
                            "bias": _np(sd[f"{key}.layer_norm.bias"])}}


def _vn_block(sd: Mapping[str, object], key: str, with_knn: bool):
    """Reference VN_Block (vn_pointr.py:366-412) -> flax VNBlock subtree.
    The scalar qkv/proj Linears inside Attention are dead on the VN path
    (forward never calls them) and are skipped."""
    c3_p, c3_s = _vnllr(sd, f"{key}.conv3")
    c4_p, c4_s = _vnllr(sd, f"{key}.conv4")
    params = {
        "norm1": _ln(sd, f"{key}.norm1"),
        "norm2": _ln(sd, f"{key}.norm2"),
        "attn": {
            name: {"kernel": _np(sd[f"{key}.attn.{name}.map_to_feat.weight"])}
            for name in ("proj_vnq", "proj_vnk", "proj_vnv", "proj_vn")
        },
        "conv3": c3_p,
        "conv4": c4_p,
    }
    stats = {"conv3": c3_s, "conv4": c4_s}
    if with_knn:
        c1_p, c1_s = _vnllr(sd, f"{key}.conv1")
        params["conv1"] = c1_p
        stats["conv1"] = c1_s
        params["conv2"] = {"kernel": _np(sd[f"{key}.conv2.map_to_feat.weight"])}
    return params, stats


def _stack_trees(trees):
    """Stack a list of identically-structured trees along a new leading axis
    (the nn.scan parameter layout)."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def vn_pointr_from_state_dict(
    sd: Mapping[str, object], enc_depth: int = 6, knn_layer: int = 1
) -> Tuple[dict, dict]:
    """Map a reference ``VN_PCTransformer`` state_dict (vn_pointr.py:414-553)
    onto the ``VNPCTransformer`` flax subtree (vn_dgcnn + vn_trans variant,
    the model.py:23-24 construction).

    Returns a PARTIAL tree, merged non-strictly by the loader — matching the
    reference's own ``load_state_dict(strict=False)`` (model.py:33).  Skipped
    by design:

    - ``input_proj`` / ``pos_embed`` / ``vn_pos_embed``: dead on the vn path
      (forward bypasses them, vn_pointr.py:596-599 / 623).
    - ``attn.qkv`` / ``attn.proj`` scalar Linears: dead (Attention.forward
      uses only the proj_vn* VNLinears, vn_pointr.py:129-145).
    - ``conv1``/``conv2`` of blocks >= knn_layer: constructed but unreachable
      (the kNN fusion branch runs only for i < knn_layer, vn_pointr.py:640).
    - ``vn_coarse_pred.2``: the reference head emits 1024 vector channels
      where the 448-coarse contract needs 224 (upstream quirk, see
      PARITY.md); the rebuild's corrected (224, 512) head keeps its init.
    - ``decoder.*`` / ``vn_mlp_query``: the only_coarse composition never
      runs them (model.py:23-24 passes only_coarse=True).
    """
    # NB: cannot use _strip_prefix("encoder") — the transformer's own block
    # stack is ALSO named ``encoder.{i}`` and would be mistaken for the
    # PCNNet wrapper prefix.  Detect the wrapper via a grouper marker key.
    if any(k.startswith("encoder.grouper.") for k in sd):
        sd = {k[len("encoder."):]: v for k, v in sd.items()
              if k.startswith("encoder.")}
    params, stats = {}, {}

    gp, gs = {}, {}
    for fk, rk in (("conv1", "grouper.conv1.0"), ("conv4", "grouper.conv4"),
                   ("conv5", "grouper.conv5"), ("conv6", "grouper.conv6")):
        p, s = _vnllr(sd, rk)
        gp[fk], gs[fk] = p, s
    params["grouper"], stats["grouper"] = gp, gs

    p, s = _vnllr(sd, "vn_input_proj.0")
    params["vn_input_proj_0"], stats["vn_input_proj_0"] = p, s
    params["vn_input_proj_1"] = {
        "kernel": _np(sd["vn_input_proj.1.map_to_feat.weight"])
    }

    p, s = _vnlalr(sd, "fourth_vn_pos_embed.0")
    params["fourth_vn_pos_embed_0"], stats["fourth_vn_pos_embed_0"] = p, s
    params["fourth_vn_pos_embed_1"] = {
        "kernel": _np(sd["fourth_vn_pos_embed.1.map_to_feat.weight"])
    }

    for i in range(knn_layer):
        p, s = _vn_block(sd, f"encoder.{i}", with_knn=True)
        params[f"encoder_{i}"], stats[f"encoder_{i}"] = p, s
    tail = [_vn_block(sd, f"encoder.{i}", with_knn=False)
            for i in range(knn_layer, enc_depth)]
    if tail:
        params["encoder_scan"] = {"block": _stack_trees([t[0] for t in tail])}
        stats["encoder_scan"] = {"block": _stack_trees([t[1] for t in tail])}

    p, s = _vnlalr(sd, "vn_increase_dim.0")
    params["vn_increase_dim_0"], stats["vn_increase_dim_0"] = p, s
    params["vn_increase_dim_1"] = {
        "kernel": _np(sd["vn_increase_dim.1.map_to_feat.weight"])
    }
    params["vn_global_pool"] = {
        "dir_kernel": _np(sd["vn_global_pool.map_to_dir.weight"])
    }
    params["vn_coarse_pred_0"] = {
        "kernel": _np(sd["vn_coarse_pred.0.map_to_feat.weight"])
    }
    params["vn_coarse_pred_1"] = {
        "dir_kernel": _np(sd["vn_coarse_pred.1.map_to_dir.weight"])
    }
    return params, stats


_ENCODER_CONVERTERS = {
    "vn_pointnet": vn_pointnet_from_state_dict,
    "dgcnn_fps": dgcnn_fps_from_state_dict,
    "vn_dgcnn_fps": vn_dgcnn_fps_from_state_dict,
    "vn_pointr": vn_pointr_from_state_dict,
}


def merge_partial_tree(target, src):
    """Non-strict recursive merge (reference load_state_dict(strict=False),
    model.py:33): leaves present in ``src`` replace the ``target``'s, missing
    subtrees keep the target's values.  Shape mismatches raise."""
    if not isinstance(src, Mapping):
        src_arr = np.asarray(src)
        if tuple(np.shape(target)) != tuple(src_arr.shape):
            raise ValueError(
                f"shape mismatch in pretrained load: "
                f"{np.shape(target)} vs {src_arr.shape}"
            )
        return src_arr
    out = dict(target)
    for k, v in src.items():
        if k not in out:
            raise KeyError(f"pretrained tree has unknown key {k!r}")
        out[k] = merge_partial_tree(out[k], v)
    return out


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
