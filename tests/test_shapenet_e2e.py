"""End-to-end: PCN-layout dataset on disk -> trainer -> eval.

Builds a miniature ShapeNet-PCN directory (list files, 8-view partials,
binary PLYs) and runs the real trainer + test harness against it with
``dataset='shapenet'`` — the path real users take.
"""

import json
import os

import numpy as np
import pytest

from tests.datagen import build_mini_pcn


def build_pcn_dataset(root, n_models=3, cats=("02691156",)):
    build_mini_pcn(root, n_models=n_models, cats=cats, scale=0.2)


class TestShapeNetEndToEnd:
    @pytest.mark.slow
    def test_train_and_eval_on_disk_dataset(self, tmp_path, monkeypatch):
        from vn_pointcloudcompletion_tpu.training.evaluate import evaluate
        from vn_pointcloudcompletion_tpu.training.trainer import train
        from vn_pointcloudcompletion_tpu.utils.config import Config
        from vn_pointcloudcompletion_tpu.utils.experiments import (
            create_experiment,
        )

        data_root = str(tmp_path / "data")
        build_pcn_dataset(os.path.join(data_root, "PCN"))
        monkeypatch.setenv("OUTPUT_DIR", str(tmp_path / "experiments"))

        config = Config.from_dict(
            dict(
                name="shapenet_e2e",
                enc_type="vn_pointnet", dec_type="vn_foldingnet",
                num_coarse=1024, latent_dim=2048, only_coarse=True,
                batch_size=2, lr=1e-3, max_epochs=0,
                rotation="none", val_rotation="so3", test_rotation="so3",
                dataset="shapenet", data_path=data_root, category="airplane",
                num_workers=2, coarse_loss="cd", log_frequency=1,
            )
        )
        config = create_experiment(config)
        result = train(config, resume=False)
        assert result["epochs_run"] == 1
        assert os.path.exists(
            os.path.join(config.exp_dir, "models", "model_best.ckpt")
        )
        res = evaluate(config, categories=["airplane"])
        assert np.isfinite(res["airplane"]["l1"])
        assert 0 <= res["airplane"]["iou"] <= 1
