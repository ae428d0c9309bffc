"""End-to-end CLI test: train + resume + test on synthetic data via main.py."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import main as cli


@pytest.fixture
def synthetic_project(tmp_path, monkeypatch):
    cfg = {
        "name": "cli_smoke",
        "enc_type": "vn_pointnet",
        "dec_type": "vn_foldingnet",
        "num_coarse": 1024,
        "latent_dim": 2048,
        "only_coarse": True,
        "batch_size": 2,
        "lr": 1e-3,
        "max_epochs": 0,
        "rotation": "none",
        "val_rotation": "none",
        "test_rotation": "none",
        "dataset": "synthetic",
        "num_workers": 1,
        "coarse_loss": "cd",
        "category": "all",
        "log_frequency": 1,
        "synthetic_train_samples": 4,
        "synthetic_val_samples": 2,
        "synthetic_test_samples": 2,
        "synthetic_n_partial": 512,
        "synthetic_n_complete": 2048,
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg, f)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("OUTPUT_DIR", str(tmp_path / "experiments"))
    return tmp_path


class TestCLI:
    def test_train_then_test(self, synthetic_project):
        cli.main(["-n", "cli_smoke", "--mesh", "1", "train"])
        exp_root = synthetic_project / "experiments"
        runs = os.listdir(exp_root)
        assert len(runs) == 1
        exp_dir = exp_root / runs[0]
        assert (exp_dir / "models" / "model_last.ckpt").exists()
        assert (exp_dir / "config.json").exists()
        assert (exp_dir / "train.log").exists()

        # resume for one more epoch
        cli.main(["-n", runs[0], "--resume", "--mesh", "1",
                  "-epochs", "1", "train"])

        # evaluate with the EMD column
        cli.main(["-n", runs[0], "--resume", "--emd", "test"])

    def test_new_run_number_increments(self, synthetic_project):
        cli.main(["-n", "cli_smoke", "--mesh", "1", "train"])
        cli.main(["-n", "cli_smoke", "--mesh", "1", "train"])
        runs = sorted(os.listdir(synthetic_project / "experiments"))
        assert runs[0].endswith("_000") and runs[1].endswith("_001")
