"""Torch .pth interop for the DGCNN-family encoders (VERDICT r2 #4).

The reference's ``enc_pretrained`` mechanism accepts any encoder state_dict
(``models/model.py:29-39``); these tests transfuse reference ``DGCNN_fps``
and ``VN_DGCNN_fps`` weights (``models/dgcnn.py:19-324``) into the flax
rebuild and require:

1. structural interop — the converted tree loads into the model's params
   tree leaf-for-leaf (nothing silently dropped or mis-keyed), and
2. forward parity — the full encoder forward matches the reference run on
   CPU torch, with the reference's CUDA externals (knn_cuda, pointnet2_ops)
   replaced by pure-torch transliterations of their semantics.
"""

import importlib
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "models")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vn_pointcloudcompletion_tpu.models.dgcnn import (  # noqa: E402
    DGCNNfps,
    VNDGCNNfps,
)
from vn_pointcloudcompletion_tpu.training.torch_interop import (  # noqa: E402
    dgcnn_fps_from_state_dict,
    vn_dgcnn_fps_from_state_dict,
)


class _TorchKNN:
    """Pure-torch stand-in for KNN_CUDA's KNN(k, transpose_mode=False):
    (B, dim, N) ref/query -> (dist, idx) each (B, k, Nq), ascending."""

    def __init__(self, k=16, transpose_mode=False):
        self.k = k

    def __call__(self, ref, query):
        r2 = (ref ** 2).sum(1)
        q2 = (query ** 2).sum(1)
        inner = torch.bmm(query.transpose(1, 2), ref)
        d = q2.unsqueeze(2) + r2.unsqueeze(1) - 2 * inner
        dist, idx = torch.topk(d, self.k, dim=2, largest=False)
        # contiguous like the CUDA wheel's output: the reference view(-1)s it
        return (dist.transpose(1, 2).contiguous(),
                idx.transpose(1, 2).contiguous())


def _torch_fps(xyz, n):
    """pointnet2 furthest_point_sample semantics: start at index 0, greedy
    max-min (matches ops/fps.py). xyz: (B, N, 3) -> int64 idx (B, n)."""
    b, num, _ = xyz.shape
    idx = torch.zeros(b, n, dtype=torch.long)
    mind = torch.full((b, num), float("inf"))
    ar = torch.arange(b)
    for i in range(1, n):
        last = xyz[ar, idx[:, i - 1]]
        d = ((xyz - last.unsqueeze(1)) ** 2).sum(-1)
        mind = torch.minimum(mind, d)
        idx[:, i] = mind.argmax(1)
    return idx


def _torch_gather(feat, idx):
    """pointnet2 gather_operation: (B, C, N), (B, S) -> (B, C, S)."""
    return torch.gather(
        feat, 2, idx.long().unsqueeze(1).expand(-1, feat.shape[1], -1)
    )


class _TorchProxy:
    """Module-global ``torch`` stand-in whose ``device()`` always returns
    CPU — dodges the hardcoded ``torch.device('cuda')`` inside
    ``vn_get_graph_feature`` (models/dgcnn.py:260)."""

    def __getattr__(self, name):
        return getattr(torch, name)

    @staticmethod
    def device(*a, **k):
        return torch.device("cpu")


def _install_stubs(mods):
    """sys.modules[name] = stub for each, returning a restore() that puts
    back whatever was there before (so stubs don't leak across tests)."""
    prev = {n: sys.modules.get(n) for n in mods}
    sys.modules.update(mods)

    def restore():
        for n, v in prev.items():
            if v is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = v

    return restore


@pytest.fixture(scope="module")
def ref_dgcnn():
    p2o = types.ModuleType("pointnet2_ops")
    p2o.pointnet2_utils = SimpleNamespace(
        furthest_point_sample=_torch_fps, gather_operation=_torch_gather
    )
    kc = types.ModuleType("knn_cuda")
    kc.KNN = _TorchKNN
    restore = _install_stubs({"pointnet2_ops": p2o, "knn_cuda": kc})

    sys.path.insert(0, REF)
    try:
        for m in ("models.dgcnn", "models.vn_layers",
                  "models.utils.transform_net", "models.utils.dgcnn_util"):
            sys.modules.pop(m, None)
        mod = importlib.import_module("models.dgcnn")
    finally:
        sys.path.remove(REF)
    # patch the module globals the forward path reads
    mod.torch = _TorchProxy()
    mod.knn = _TorchKNN(16)
    mod.pointnet2_utils = p2o.pointnet2_utils
    yield mod
    restore()


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): tuple(np.shape(l)) for p, l in flat}


def _assert_structural_match(converted, initialized):
    got, want = _tree_shapes(converted), _tree_shapes(initialized)
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))}; "
        f"extra: {sorted(set(got) - set(want))}; "
        f"shape diffs: "
        f"{[(k, got[k], want[k]) for k in got.keys() & want.keys() if got[k] != want[k]]}"
    )


@pytest.mark.parametrize("num_coarse", [1024, 448])
def test_dgcnn_fps_structural(ref_dgcnn, num_coarse):
    torch.manual_seed(0)
    ref = ref_dgcnn.DGCNN_fps(SimpleNamespace(num_coarse=num_coarse))
    p, s = dgcnn_fps_from_state_dict(ref.state_dict())
    x = jnp.zeros((1, 600, 3), jnp.float32)
    v = DGCNNfps(num_coarse=num_coarse).init(jax.random.key(0), x)
    _assert_structural_match(p, v["params"])
    _assert_structural_match(s, v.get("batch_stats", {}))


@pytest.mark.parametrize("num_coarse", [1024, 448])
def test_vn_dgcnn_fps_structural(ref_dgcnn, num_coarse):
    torch.manual_seed(0)
    ref = ref_dgcnn.VN_DGCNN_fps(SimpleNamespace(num_coarse=num_coarse))
    p, s = vn_dgcnn_fps_from_state_dict(ref.state_dict())
    x = jnp.zeros((1, 600, 3), jnp.float32)
    v = VNDGCNNfps(num_coarse=num_coarse).init(jax.random.key(0), x)
    _assert_structural_match(p, v["params"])
    _assert_structural_match(s, v.get("batch_stats", {}))


def test_dgcnn_fps_forward_parity(ref_dgcnn):
    torch.manual_seed(0)
    ref = ref_dgcnn.DGCNN_fps(SimpleNamespace(num_coarse=1024)).eval()
    rng = np.random.default_rng(3)
    xyz = rng.standard_normal((2, 1024, 3)).astype(np.float32) * 0.3
    with torch.no_grad():
        coarse_t, fg_t = ref(torch.from_numpy(xyz))

    p, s = dgcnn_fps_from_state_dict(ref.state_dict())
    coarse_j, fg_j = DGCNNfps(num_coarse=1024).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(xyz), train=False
    )
    np.testing.assert_allclose(
        np.asarray(fg_j), fg_t.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(coarse_j), coarse_t.numpy(), atol=2e-4
    )


def test_vn_dgcnn_fps_forward_parity(ref_dgcnn):
    torch.manual_seed(0)
    ref = ref_dgcnn.VN_DGCNN_fps(SimpleNamespace(num_coarse=1024)).eval()
    rng = np.random.default_rng(5)
    xyz = rng.standard_normal((2, 1024, 3)).astype(np.float32) * 0.3
    with torch.no_grad():
        coarse_t, fg_t = ref(torch.from_numpy(xyz))

    p, s = vn_dgcnn_fps_from_state_dict(ref.state_dict())
    coarse_j, fg_j = VNDGCNNfps(num_coarse=1024).apply(
        {"params": p, "batch_stats": s}, jnp.asarray(xyz), train=False
    )
    # reference global feature is (B, 512, 3, 1) vec layout
    np.testing.assert_allclose(
        np.asarray(fg_j), fg_t.numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(coarse_j), coarse_t.numpy(), atol=3e-4
    )


def test_vn_pointr_interop(tmp_path):
    """VN_PCTransformer state_dict -> VNPCTransformer (VERDICT r2 #4).

    The converter returns a partial tree (reference quirks documented in
    vn_pointr_from_state_dict's docstring); the loader merges it
    non-strictly — the reference's own strict=False semantics
    (models/model.py:33).  Asserts: every converted leaf lands somewhere in
    the init tree with the right shape, the diverged coarse head keeps its
    init, and the scan-stacked encoder tail receives the per-block torch
    weights in layer order.
    """
    import importlib

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.models.layers")

    class _DropPath(torch.nn.Identity):
        def __init__(self, *a, **k):
            super().__init__()

    layers.DropPath = _DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models_mod = types.ModuleType("timm.models")
    models_mod.layers = layers
    timm.models = models_mod

    p2o = types.ModuleType("pointnet2_ops")
    p2o.pointnet2_utils = SimpleNamespace(
        furthest_point_sample=_torch_fps, gather_operation=_torch_gather
    )
    kc = types.ModuleType("knn_cuda")
    kc.KNN = _TorchKNN
    restore = _install_stubs({
        "timm": timm, "timm.models": models_mod,
        "timm.models.layers": layers,
        "pointnet2_ops": p2o, "knn_cuda": kc,
    })

    sys.path.insert(0, REF)
    try:
        for m in list(sys.modules):
            if m.startswith("models."):
                sys.modules.pop(m)
        sys.modules.pop("models", None)
        ref_mod = importlib.import_module("models.pointr.vn_pointr")
    finally:
        sys.path.remove(REF)
        restore()

    torch.manual_seed(0)
    ref = ref_mod.VN_PCTransformer(
        embed_dim=384, depth=[6, 8], num_query=224, knn_layer=1,
        dgcnn="vn_dgcnn", trans="vn_trans", only_coarse=True,
    )
    sd = ref.state_dict()

    from vn_pointcloudcompletion_tpu.models.pointr import VNPCTransformer
    from vn_pointcloudcompletion_tpu.training.torch_interop import (
        merge_partial_tree,
        vn_pointr_from_state_dict,
    )

    p, s = vn_pointr_from_state_dict(sd)
    assert "vn_coarse_pred_2" not in p  # diverged head stays at init

    model = VNPCTransformer(
        embed_dim=384, enc_depth=6, dec_depth=8, num_query=224,
        knn_layer=1, dgcnn="vn_dgcnn", trans="vn_trans", only_coarse=True,
    )
    x = jnp.zeros((1, 600, 3), jnp.float32)
    v = jax.jit(lambda r, a: model.init(r, a, train=False))(
        jax.random.key(0), x
    )

    merged_p = merge_partial_tree(v["params"], p)
    merged_s = merge_partial_tree(v["batch_stats"], s)
    _assert_structural_match(merged_p, v["params"])
    _assert_structural_match(merged_s, v["batch_stats"])

    # scan stack carries blocks 1..5 in order: row i of the stacked kernel
    # equals torch block (1 + i)'s weight
    stacked = np.asarray(merged_p["encoder_scan"]["block"]["attn"]["proj_vnq"]["kernel"])
    for i in range(5):
        want = sd[f"encoder.{1 + i}.attn.proj_vnq.map_to_feat.weight"].numpy()
        np.testing.assert_array_equal(stacked[i], want)
    # head kept its init
    np.testing.assert_array_equal(
        np.asarray(merged_p["vn_coarse_pred_2"]["kernel"]),
        np.asarray(v["params"]["vn_coarse_pred_2"]["kernel"]),
    )
    # changed leaves actually landed
    changed = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(merged_p),
                        jax.tree_util.tree_leaves(v["params"]))
    )
    assert changed > 30


def test_load_pretrained_encoder_pth_dgcnn(ref_dgcnn, tmp_path):
    """enc_pretrained end-to-end: save a reference .pth, load via the
    checkpoint path used by the trainer (VERDICT r2 #4 done-bar)."""
    from vn_pointcloudcompletion_tpu.models.composer import build_model
    from vn_pointcloudcompletion_tpu.training.checkpoint import (
        load_pretrained_encoder,
    )
    from vn_pointcloudcompletion_tpu.training.state import create_train_state
    from vn_pointcloudcompletion_tpu.utils.config import Config

    torch.manual_seed(1)
    for enc_type, ref_cls in (
        ("dgcnn_fps", ref_dgcnn.DGCNN_fps),
        ("vn_dgcnn_fps", ref_dgcnn.VN_DGCNN_fps),
    ):
        ref = ref_cls(SimpleNamespace(num_coarse=1024))
        path = str(tmp_path / f"{enc_type}.pth")
        torch.save(ref.state_dict(), path)

        config = Config.from_dict(dict(
            enc_type=enc_type, dec_type="foldingnet", num_coarse=1024,
            latent_dim=1024, only_coarse=True, batch_size=2,
        ))
        model = build_model(config)
        x = jnp.zeros((2, 600, 3), jnp.float32)
        state = create_train_state(model, config, 10, jax.random.key(0), x)
        loaded = load_pretrained_encoder(state, path, enc_type=enc_type)
        # a converted leaf actually landed in the state
        before = jax.tree_util.tree_leaves(state.params["encoder"])
        after = jax.tree_util.tree_leaves(loaded.params["encoder"])
        changed = sum(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed > 5, f"{enc_type}: pretrained load was a no-op"
