"""Golden-value regression tests: model forwards pinned to committed
fingerprints under fixed seeds (CPU f32 — deterministic).

Regenerate deliberately with: python tests/test_golden.py --regen
(after verifying the change is intended, e.g. via the torch-parity tests).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from tests.golden_utils import (
    load_goldens,
    model_fingerprint,
    save_goldens,
)


def _cases():
    from vn_pointcloudcompletion_tpu.models import (
        PCN,
        PCNNet,
        VNDGCNNfps,
        VNPCTransformer,
        VNPointNet,
    )
    from vn_pointcloudcompletion_tpu.models.dgcnn import DGCNNfps

    return {
        "pcn_small": (PCN(num_dense=256, latent_dim=64, grid_size=4), (2, 128, 3)),
        "vn_pointnet": (VNPointNet(num_coarse=64, latent_dim=8), (2, 128, 3)),
        "vn_dgcnn_fps": (VNDGCNNfps(num_coarse=32), (1, 600, 3)),
        "dgcnn_fps": (DGCNNfps(num_coarse=32, latent_dim=64), (1, 600, 3)),
        "vn_pointr": (VNPCTransformer(enc_depth=2, num_query=32), (1, 600, 3)),
        "pcnnet_flagship_small": (
            PCNNet(enc_type="vn_pointnet", dec_type="vn_foldingnet",
                   num_coarse=64, latent_dim=2048),
            (1, 256, 3),
        ),
    }


@pytest.mark.parametrize("name", list(_cases().keys()))
def test_golden(name):
    goldens = load_goldens()
    if name not in goldens:
        pytest.skip(f"no golden recorded for {name}; run --regen")
    model, shape = _cases()[name]
    fp = model_fingerprint(model, shape)
    np.testing.assert_allclose(
        fp, goldens[name], rtol=1e-4, atol=1e-5,
        err_msg=f"{name}: model forward diverged from committed golden; "
        "if intentional, regenerate with python tests/test_golden.py --regen",
    )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tests.conftest  # noqa: F401  (forces CPU platform)

        goldens = {}
        for name, (model, shape) in _cases().items():
            goldens[name] = model_fingerprint(model, shape)
            print(f"recorded {name}: {goldens[name][:4]}")
        save_goldens(goldens)
        print("goldens written")
    else:
        print("use --regen to record goldens, or run under pytest")
