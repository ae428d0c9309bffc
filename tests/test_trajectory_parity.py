"""Training-TRAJECTORY parity against the reference torch implementation.

Closes the gap between "one step matches" (tests/test_torch_parity.py::
test_flagship_param_gradients_match — gradient parity at f64) and "training
matches": both sides start from identical transfused weights and run the
reference ``train.py:45-279`` loop semantics — Adam(lr, betas=(0.9, 0.999)),
loss = cd_loss_L1(coarse, gt) + cd_loss_L1(dense, gt) (train.py:70,146-167),
BN in train mode — for 12 optimiser steps on identical seed-translated data,
and the loss trajectories must track step for step.  (12 steps / 512-point
GT clouds: the torch side is dense f64 CPU chamfer at 16384 fine points —
50 steps exceeded 40 min on a 1-core host; 12 steps already compound Adam
moments, BN stats and pool-selection drift well beyond one-step parity.)

The model is the full flagship pair (num_coarse=1024 — the reference
decoder hardcodes its 16384-point fine reshape, models/pcn.py:376); the GT
clouds are kept at 512 points so the f64 CPU steps of the dense torch
chamfer oracle (chamfer_python.py:18-39) stay tractable.

Both sides run float64 so the comparison pins *semantics* (custom chamfer
VJP, straight-through argmax pools, BN-on-norm batch stats, Adam update
math) rather than f32 summation noise.

What "tracks" can honestly mean here (measured, round 5): the architecture
is CHAOTIC under training — the encoder's argmax pools flip on ulp-level
weight drift and the per-step loss gap grows ~10x/step (measured from the
5.6e-8 step-0 cross-framework noise floor: 1e-7, 7e-7, 2e-5, ... 0.26 by
step ~6-8, at lr 1e-4 AND lr 1e-5 alike), so step-for-step tracking over
12 steps is impossible for ANY two non-bitwise-identical implementations
— including the reference against itself.  The test therefore asserts two
things: (1) the first 3 steps track at <=1e-4 (initialisation transfusion,
forward, loss, and the first compounded Adam/BN updates are right), and
(2) the full-trajectory gap stays inside the architecture's own Lyapunov
envelope, calibrated IN the test by rerunning the torch loop against
itself with weights perturbed at the measured cross-framework noise floor
(1e-8 relative) — torch-vs-torch diverges comparably, proving the gap is
intrinsic amplification, not an implementation bias.

Slow tier (each torch loop is ~2 min of f64 CPU chamfer; there are two).
"""

import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference checkout unavailable", allow_module_level=True)

import importlib  # noqa: E402
import importlib.util  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load_ref_module(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_reference_pair(num_coarse, latent_dim):
    """Reference VN_PointNet + VN_FoldingNet on CPU torch (CUDA deps
    stubbed, .cuda() patched out — same recipe as test_torch_parity.py)."""
    p2o = types.ModuleType("pointnet2_ops")
    p2o.pointnet2_utils = SimpleNamespace()
    sys.modules.setdefault("pointnet2_ops", p2o)
    kc = types.ModuleType("knn_cuda")

    class _KNNStub:
        def __init__(self, *a, **k):
            pass

    kc.KNN = _KNNStub
    sys.modules.setdefault("knn_cuda", kc)

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    sys.path.insert(0, REF)
    try:
        ref_pcn = importlib.import_module("models.pcn")
        cfg = SimpleNamespace(num_coarse=num_coarse, latent_dim=latent_dim)
        torch.manual_seed(0)
        enc = ref_pcn.VN_PointNet(cfg)
        dec = ref_pcn.VN_FoldingNet(cfg)
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REF)
    return enc, dec


@pytest.mark.slow
def test_training_trajectory_tracks_reference():
    import optax

    from vn_pointcloudcompletion_tpu.metrics.losses import cd_loss_l1
    from vn_pointcloudcompletion_tpu.models.composer import PCNNet
    from vn_pointcloudcompletion_tpu.training.torch_interop import (
        pcnnet_variables_from_torch,
    )

    NUM_COARSE, LATENT, STEPS, LR = 1024, 2048, 12, 1e-4
    ref_chamfer = _load_ref_module(
        "ref_chamfer_python_traj",
        "extensions/ChamferDistancePytorch/chamfer_python.py",
    )
    enc, dec = _build_reference_pair(NUM_COARSE, LATENT)

    # identical seed-translated data for both sides: STEPS distinct batches
    rng = np.random.default_rng(1234)
    batches = [
        (
            rng.standard_normal((2, 256, 3)).astype(np.float64) * 0.3,
            rng.standard_normal((2, 512, 3)).astype(np.float64) * 0.3,
        )
        for _ in range(STEPS)
    ]

    # --- torch side: reference loop semantics (train.py:70,145-173) -----
    enc64, dec64 = enc.double().train(), dec.double().train()
    # snapshot the initial weights BEFORE the torch loop: .double() converts
    # in place (enc64 IS enc) and torch.optim updates parameters in place,
    # so a state_dict taken after training would hand the jax side torch's
    # post-step-12 weights instead of the shared initialisation
    sd = {
        f"encoder.{k}": v.detach().clone()
        for k, v in enc64.state_dict().items()
    }
    sd.update({
        f"decoder.{k}": v.detach().clone()
        for k, v in dec64.state_dict().items()
    })
    def torch_cd_l1(a, b):
        d1, d2, _, _ = ref_chamfer.distChamfer(a, b)
        return (torch.mean(torch.sqrt(d1)) + torch.mean(torch.sqrt(d2))) / 2.0

    def run_torch_loop():
        opt = torch.optim.Adam(
            list(enc64.parameters()) + list(dec64.parameters()),
            lr=LR, betas=(0.9, 0.999),
        )
        losses = []
        for part, gt in batches:
            xt, gtt = torch.from_numpy(part), torch.from_numpy(gt)
            opt.zero_grad()
            coarse_t, fg_t = enc64(xt)
            fine_t = dec64(coarse_t, fg_t, None)
            loss = torch_cd_l1(coarse_t, gtt) + torch_cd_l1(fine_t, gtt)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        return np.asarray(losses)

    losses_t = run_torch_loop()

    # Lyapunov control: same loop from the same snapshot, weights perturbed
    # at the measured cross-framework noise floor (1e-8 rel) — calibrates
    # how fast this architecture amplifies ulp-level differences on its own
    enc64.load_state_dict(
        {k[len("encoder."):]: v for k, v in sd.items()
         if k.startswith("encoder.")})
    dec64.load_state_dict(
        {k[len("decoder."):]: v for k, v in sd.items()
         if k.startswith("decoder.")})
    with torch.no_grad():
        for prm in list(enc64.parameters()) + list(dec64.parameters()):
            prm.mul_(1.0 + 1e-8)
    losses_t2 = run_torch_loop()

    # --- jax side: same init (snapshot above), optax.adam == torch Adam --
    jax.config.update("jax_enable_x64", True)
    try:
        variables = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
            pcnnet_variables_from_torch(sd, latent_dim=LATENT),
        )
        model = PCNNet(
            enc_type="vn_pointnet", dec_type="vn_foldingnet",
            num_coarse=NUM_COARSE, latent_dim=LATENT, only_coarse=False,
        )
        tx = optax.adam(LR, b1=0.9, b2=0.999, eps=1e-8)
        params, stats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, stats, opt_state, part, gt):
            def loss_fn(p):
                (coarse, fine), mut = model.apply(
                    {"params": p, "batch_stats": stats},
                    part, train=True, mutable=["batch_stats"],
                )
                return (
                    cd_loss_l1(coarse, gt) + cd_loss_l1(fine, gt),
                    mut["batch_stats"],
                )

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (
                optax.apply_updates(params, updates),
                new_stats, opt_state, loss,
            )

        losses_j = []
        for part, gt in batches:
            params, stats, opt_state, loss = train_step(
                params, stats, opt_state, jnp.asarray(part), jnp.asarray(gt)
            )
            losses_j.append(float(loss))
    finally:
        jax.config.update("jax_enable_x64", False)

    losses_j = np.asarray(losses_j)
    rel = np.abs(losses_j - losses_t) / np.abs(losses_t)
    rel_tt = np.abs(losses_t2 - losses_t) / np.abs(losses_t)
    # (1) semantics: the first steps track before chaotic amplification
    assert rel[:3].max() < 1e-4, (
        f"early trajectory diverged: rel gaps {rel[:3]} "
        f"(torch={losses_t[:3]} jax={losses_j[:3]})"
    )
    # (2) the full-run gap stays inside the architecture's own Lyapunov
    # envelope (10x the torch-vs-perturbed-torch control)
    assert rel.max() <= max(10.0 * rel_tt.max(), 1e-4), (
        f"jax-vs-torch gap {rel.max():.3g} exceeds 10x the torch-vs-torch "
        f"control {rel_tt.max():.3g}: bias, not chaos (rel={rel}, "
        f"rel_tt={rel_tt})"
    )
    # and training actually trained on both sides
    assert losses_t[-1] < losses_t[0]
    assert losses_j[-1] < losses_j[0]
