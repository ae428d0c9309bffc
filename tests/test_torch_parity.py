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


@pytest.fixture(autouse=True)
def _seed_torch():
    # reference layers draw weights from torch's GLOBAL generator; without
    # seeding, parity outcomes depend on how much torch RNG earlier tests
    # consumed (order-dependent flakes). One seed, order-independence.
    torch.manual_seed(0)


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
        # the running update itself must also match (torch's is unbiased):
        # eval-mode behaviour after resume diverges silently otherwise
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["BatchNorm_0"]["mean"]),
            t2n(ref.bn.running_mean), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["BatchNorm_0"]["var"]),
            t2n(ref.bn.running_var), atol=1e-5,
        )

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
        # Gram-Schmidt frames amplify f32 rounding for ill-conditioned
        # draws (measured tail ~1e-4 over random inits); 2e-4 is fair
        np.testing.assert_allclose(std, t2n(std_ref), atol=2e-4)
        np.testing.assert_allclose(frame, t2n(frame_ref), atol=2e-4)


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


@pytest.mark.slow
class TestModelParity:
    """Full-pipeline wiring parity (BASELINE 'match under identical seeds' bar).

    Slow tier: the class fixture transfuses the full torch reference model
    (~3 min); the fast tier keeps the per-layer torch pins above.

    Transfuses reference ``VN_PointNet`` + ``VN_FoldingNet`` weights
    (models/pcn.py:110-184,319-389 — no CUDA op on the num_coarse=1024 path)
    into the flax rebuild via training/torch_interop.py.

    The composed encoder contains two argmax pools whose top-2 dot products
    can coincide to ~1e-10 at random init; f32 noise then flips the selected
    index on either side and contaminates everything downstream.  So parity
    is pinned stage-wise — every deterministic stage is fed the reference's
    own intermediate input and must match tightly; pool index mismatches must
    be justified ties (relative gap < 1e-5); the decoder (argmax-free) and
    the loss close the chain end-to-end.  A layout/transpose/split-column bug
    anywhere fails its stage outright.
    """

    @pytest.fixture(scope="class")
    def transfused(self):
        import importlib
        import types
        from types import SimpleNamespace

        # stub the CUDA-only pip deps pulled in by the reference package
        p2o = types.ModuleType("pointnet2_ops")
        p2o.pointnet2_utils = SimpleNamespace()
        sys.modules.setdefault("pointnet2_ops", p2o)
        kc = types.ModuleType("knn_cuda")

        class _KNNStub:
            def __init__(self, *a, **k):
                pass

        kc.KNN = _KNNStub
        sys.modules.setdefault("knn_cuda", kc)

        # the reference pins its folding seed with .cuda() at construction
        # (models/pcn.py:362); run it on CPU torch
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        sys.path.insert(0, REF)
        try:
            ref_pcn = importlib.import_module("models.pcn")
            cfg = SimpleNamespace(num_coarse=1024, latent_dim=2048)
            torch.manual_seed(0)
            enc = ref_pcn.VN_PointNet(cfg)
            dec = ref_pcn.VN_FoldingNet(cfg)
        finally:
            torch.Tensor.cuda = orig_cuda
            sys.path.remove(REF)

        from vn_pointcloudcompletion_tpu.training.torch_interop import (
            vn_foldingnet_from_state_dict,
            vn_pointnet_from_state_dict,
        )

        enc_p, enc_s = vn_pointnet_from_state_dict(enc.state_dict())
        dec_p, dec_s = vn_foldingnet_from_state_dict(dec.state_dict(), 2048)
        rng = np.random.default_rng(7)
        xyz = rng.standard_normal((2, 256, 3)).astype(np.float32) * 0.3

        # reference intermediates, manual forward (models/pcn.py:165-184)
        enc.eval(), dec.eval()
        with torch.no_grad():
            x = torch.from_numpy(xyz)
            feat1 = enc.first_conv(x.transpose(2, 1).unsqueeze(1))
            fg1 = enc.maxpool1(feat1).unsqueeze(-1)
            cat = torch.cat([fg1.expand(-1, -1, -1, 256), feat1], dim=1)
            feat2 = enc.second_conv(cat)
            fg2 = enc.maxpool2(feat2).unsqueeze(-1)
            coarse = enc.mlp(fg2).reshape(-1, 1024, 3)
            fine = dec(coarse, fg2, None)
        ref = dict(
            feat1=t2n(feat1), fg1=t2n(fg1), cat=t2n(cat), feat2=t2n(feat2),
            fg2=t2n(fg2), coarse=t2n(coarse), fine=t2n(fine),
        )
        return enc, dec, (enc_p, enc_s), (dec_p, dec_s), xyz, ref

    @staticmethod
    def _sub(tree_pair, key):
        p, s = tree_pair
        v = {"params": p["trunk"][key]}
        if key in s.get("trunk", {}):
            v["batch_stats"] = s["trunk"][key]
        return v

    def test_first_conv_stage(self, transfused):
        from vn_pointcloudcompletion_tpu.nn.vn import VNLinear, VNLinearLeakyReLU

        _, _, encv, _, xyz, ref = transfused
        xj = jnp.asarray(xyz).transpose(0, 2, 1)[:, :, None, :]  # (B,3,1,N)
        f = VNLinearLeakyReLU(128, layout="plane").apply(
            self._sub(encv, "first_conv_0"), xj, train=False
        )
        f = VNLinear(512, layout="plane").apply(
            self._sub(encv, "first_conv_1"), f
        )
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 2, 1, 3), ref["feat1"], atol=1e-5
        )

    def test_second_conv_stage(self, transfused):
        # fed the reference's own concat input: no pool-tie contamination
        from vn_pointcloudcompletion_tpu.nn.vn import VNLinear, VNLinearLeakyReLU

        _, _, encv, _, _, ref = transfused
        cat = jnp.asarray(ref["cat"]).transpose(0, 2, 1, 3)  # plane layout
        f = VNLinearLeakyReLU(1024, layout="plane").apply(
            self._sub(encv, "second_conv_0"), cat, train=False
        )
        f = VNLinear(2048, layout="plane").apply(
            self._sub(encv, "second_conv_1"), f
        )
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 2, 1, 3), ref["feat2"], atol=2e-4
        )

    @pytest.mark.parametrize("pool,src", [("maxpool1", "feat1"), ("maxpool2", "feat2")])
    def test_pool_indices_match_or_tied(self, transfused, pool, src):
        _, _, encv, _, _, ref = transfused
        x = jnp.asarray(ref[src])  # (B, C, 3, N) vec layout, exact ref input
        w = jnp.asarray(encv[0]["trunk"][pool]["dir_kernel"])
        d = jnp.einsum("oc,bcjn->bojn", w, x)
        dot = np.asarray(jnp.sum(x * d, axis=2), dtype=np.float64)  # (B,C,N)
        idx_mine = dot.argmax(axis=-1)
        # torch side on the same input
        xt = torch.from_numpy(ref[src])
        with torch.no_grad():
            dt = torch.einsum("oc,bcjn->bojn", torch.from_numpy(np.asarray(w)), xt)
            dot_t = (xt * dt).sum(2).numpy()
        idx_ref = dot_t.argmax(axis=-1)
        mism = idx_mine != idx_ref
        # every mismatch must be a justified tie: relative gap < 1e-5
        b, c = np.nonzero(mism)
        for bi, ci in zip(b, c):
            v1 = dot[bi, ci, idx_mine[bi, ci]]
            v2 = dot[bi, ci, idx_ref[bi, ci]]
            gap = abs(v1 - v2) / max(abs(v1), abs(v2), 1e-12)
            assert gap < 1e-5, f"{pool} idx flip at gap {gap:.2e} is not a tie"
        assert mism.mean() < 0.02, f"{pool}: {mism.sum()} flips (> 2%)"

    def test_mlp_stage(self, transfused):
        from vn_pointcloudcompletion_tpu.nn.vn import VNLinear, VNLinearAndLeakyReLU

        _, _, encv, _, _, ref = transfused
        fg = jnp.asarray(ref["fg2"])  # (B, 2048, 3, 1) vec layout
        h = VNLinearAndLeakyReLU(2048, use_batchnorm="none").apply(
            self._sub(encv, "mlp_0"), fg, train=False
        )
        h = VNLinearAndLeakyReLU(1024, use_batchnorm="none").apply(
            self._sub(encv, "mlp_1"), h, train=False
        )
        coarse = VNLinear(1024).apply(self._sub(encv, "mlp_2"), h)
        np.testing.assert_allclose(
            np.asarray(coarse).reshape(2, 1024, 3), ref["coarse"], atol=1e-4
        )

    @pytest.mark.parametrize("train", [False, True])
    def test_decoder_stage(self, transfused, train):
        # argmax-free: exact end-to-end comparison, eval AND train-BN mode
        from vn_pointcloudcompletion_tpu.models.pcn import VNFoldingNet

        import copy

        _, dec, _, decv, _, ref = transfused
        dec_p, dec_s = decv
        # train-mode BN updates running stats in-place even under no_grad;
        # run on a copy so the class-scoped fixture stays pristine for
        # later tests (test_composed_end_to_end compares against baselines
        # recorded with the pre-mutation stats)
        dec_t = copy.deepcopy(dec)
        dec_t.train(mode=train)
        with torch.no_grad():
            fine_ref = t2n(
                dec_t(torch.from_numpy(ref["coarse"]),
                      torch.from_numpy(ref["fg2"]), None)
            )
        mod = VNFoldingNet(num_coarse=1024, latent_dim=2048)
        out = mod.apply(
            {"params": dec_p, "batch_stats": dec_s},
            jnp.asarray(ref["coarse"]), jnp.asarray(ref["fg2"]), None,
            train=train, mutable=["batch_stats"] if train else False,
        )
        fine = out[0] if train else out
        np.testing.assert_allclose(np.asarray(fine), fine_ref, atol=2e-4)

    def test_composed_end_to_end(self, transfused):
        # full PCNNet apply with the transfused tree: shapes + loose agreement
        # (pool ties bound the achievable tolerance at random init)
        from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1
        from vn_pointcloudcompletion_tpu.models.composer import PCNNet
        from vn_pointcloudcompletion_tpu.training.torch_interop import (
            pcnnet_variables_from_torch,
        )

        enc, dec, _, _, xyz, ref = transfused
        sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
        sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
        variables = pcnnet_variables_from_torch(sd, latent_dim=2048)
        model = PCNNet(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=1024, latent_dim=2048, only_coarse=False,
        )
        coarse, fine = model.apply(variables, jnp.asarray(xyz), train=False)
        assert coarse.shape == (2, 1024, 3) and fine.shape == (2, 16384, 3)
        # a wiring bug shifts the cloud by its own scale (~5e-2); ties only
        # perturb at the ~1e-3 level
        assert float(cd_loss_l1(fine, jnp.asarray(ref["fine"]))) < 5e-3
        np.testing.assert_allclose(
            np.median(np.abs(np.asarray(coarse) - ref["coarse"])), 0, atol=2e-3
        )

    @pytest.mark.slow
    def test_flagship_param_gradients_match(self, transfused):
        """Backward parity: d(cd_L1(coarse)+cd_L1(fine))/d(params) vs torch.

        The training-dynamics bar (VERDICT r2 #1a): same transfused weights,
        same batch, the reference loss (metrics/loss.py:20-31 over the
        pure-torch chamfer oracle chamfer_python.py:18-39), BN in train mode
        — every parameter gradient must agree.  Run in float64 on both sides
        so the comparison pins backward *semantics* (custom chamfer VJP,
        straight-through argmax pools, BN-on-norms batch-stat autodiff)
        rather than float32 summation noise; the pool top-2 gaps (~1e-10
        relative) then resolve identically on both sides.

        Torch grads are mapped into the flax layout by running the weight
        transfusion functions on the grad tensors themselves — the mapping is
        pure key renaming/copying, so it transports gradients exactly.
        """
        import copy

        from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1
        from vn_pointcloudcompletion_tpu.models.composer import PCNNet
        from vn_pointcloudcompletion_tpu.training.torch_interop import (
            pcnnet_variables_from_torch,
        )

        ref_chamfer = _load_ref_module(
            "ref_chamfer_python",
            "extensions/ChamferDistancePytorch/chamfer_python.py",
        )
        enc, dec, _, _, xyz, _ = transfused
        rng = np.random.default_rng(23)
        gt = rng.standard_normal((2, 2048, 3)).astype(np.float64) * 0.3

        # --- torch side (float64, BN train mode) -------------------------
        enc64 = copy.deepcopy(enc).double().train()
        dec64 = copy.deepcopy(dec).double().train()
        xt = torch.from_numpy(xyz.astype(np.float64))
        gtt = torch.from_numpy(gt)

        def torch_cd_l1(a, b):
            d1, d2, _, _ = ref_chamfer.distChamfer(a, b)
            return (torch.mean(torch.sqrt(d1)) + torch.mean(torch.sqrt(d2))) / 2.0

        coarse_t, fg_t = enc64(xt)
        fine_t = dec64(coarse_t, fg_t, None)
        loss_t = torch_cd_l1(coarse_t, gtt) + torch_cd_l1(fine_t, gtt)
        loss_t.backward()

        grad_sd = {}
        for prefix, mod in (("encoder", enc64), ("decoder", dec64)):
            for k, p in mod.named_parameters():
                g = p.grad
                grad_sd[f"{prefix}.{k}"] = (
                    torch.zeros_like(p) if g is None else g
                )
            for k, b in mod.named_buffers():  # mapping needs the stat keys
                grad_sd[f"{prefix}.{k}"] = torch.zeros_like(b)
        ref_grads = pcnnet_variables_from_torch(grad_sd, latent_dim=2048)[
            "params"
        ]

        # --- jax side (x64) ---------------------------------------------
        sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
        sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
        jax.config.update("jax_enable_x64", True)
        try:
            variables = jax.tree.map(
                lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float64)
                if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
                pcnnet_variables_from_torch(sd, latent_dim=2048),
            )
            model = PCNNet(
                enc_type="vn_pointnet", dec_type="vn_foldingnet",
                num_coarse=1024, latent_dim=2048, only_coarse=False,
            )
            xj = jnp.asarray(xyz, dtype=jnp.float64)
            gtj = jnp.asarray(gt)

            def loss_fn(params):
                (coarse, fine), _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    xj, train=True, mutable=["batch_stats"],
                )
                return cd_loss_l1(coarse, gtj) + cd_loss_l1(fine, gtj)

            loss_j, grads = jax.value_and_grad(loss_fn)(variables["params"])
        finally:
            jax.config.update("jax_enable_x64", False)

        # measured agreement: coarse ~1e-14, fine/loss ~1e-8 — the residual
        # is the float32-quantised folding-seed constants both sides carry
        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=1e-6
        )

        flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
        flat_got = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
        assert len(flat_ref) == len(flat_got) > 20
        for path, want in flat_ref:
            got = np.asarray(flat_got[path], dtype=np.float64)
            want = np.asarray(want, dtype=np.float64)
            name = jax.tree_util.keystr(path)
            scale = max(np.abs(want).max(), 1e-12)
            np.testing.assert_allclose(
                got, want, rtol=1e-4, atol=1e-4 * scale,
                err_msg=f"gradient mismatch at {name}",
            )

    def test_cd_loss_l1_formula(self, transfused):
        # formula parity vs the reference's pure-torch chamfer oracle
        # (chamfer_python.py:18-39 + metrics/loss.py:20-31) on identical input
        from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1

        ref_chamfer = _load_ref_module(
            "ref_chamfer_python",
            "extensions/ChamferDistancePytorch/chamfer_python.py",
        )
        rng = np.random.default_rng(11)
        a = rng.standard_normal((2, 512, 3)).astype(np.float32) * 0.3
        b = rng.standard_normal((2, 1024, 3)).astype(np.float32) * 0.3
        d1, d2, _, _ = ref_chamfer.distChamfer(
            torch.from_numpy(a), torch.from_numpy(b)
        )
        want = float((torch.mean(torch.sqrt(d1)) + torch.mean(torch.sqrt(d2))) / 2.0)
        got = float(cd_loss_l1(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestTorchCheckpointInterop:
    """Reference ``.pth`` encoder pretrains load into the rebuild
    (reference models/model.py:29-39; VERDICT Missing #5)."""

    def test_load_pretrained_encoder_pth(self, tmp_path):
        import importlib
        import types
        from types import SimpleNamespace

        p2o = types.ModuleType("pointnet2_ops")
        p2o.pointnet2_utils = SimpleNamespace()
        sys.modules.setdefault("pointnet2_ops", p2o)
        kc = types.ModuleType("knn_cuda")
        kc.KNN = type("KNN", (), {"__init__": lambda s, *a, **k: None})
        sys.modules.setdefault("knn_cuda", kc)
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        sys.path.insert(0, REF)
        try:
            ref_pcn = importlib.import_module("models.pcn")
            torch.manual_seed(1)
            enc = ref_pcn.VN_PointNet(SimpleNamespace(num_coarse=1024, latent_dim=2048))
        finally:
            torch.Tensor.cuda = orig_cuda
            sys.path.remove(REF)
        path = str(tmp_path / "enc.pth")
        torch.save(enc.state_dict(), path)

        from vn_pointcloudcompletion_tpu.models.composer import build_model
        from vn_pointcloudcompletion_tpu.training.checkpoint import (
            load_pretrained_encoder,
        )
        from vn_pointcloudcompletion_tpu.training.state import create_train_state
        from vn_pointcloudcompletion_tpu.utils.config import Config

        config = Config.from_dict(dict(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=1024, latent_dim=2048, only_coarse=True,
            batch_size=2, lr=1e-4,
        ))
        model = build_model(config)
        state = create_train_state(
            model, config, 10, jax.random.key(0),
            jnp.zeros((2, 64, 3), jnp.float32),
        )
        state2 = load_pretrained_encoder(state, path, enc_type="vn_pointnet")
        got = np.asarray(
            state2.params["encoder"]["trunk"]["first_conv_0"]["kernel"]
        )
        want = enc.first_conv[0].map_to_feat.weight.detach().numpy()
        np.testing.assert_allclose(got, want, atol=0)
