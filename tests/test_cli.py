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
    @pytest.mark.slow
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

        # batch inference over a directory of raw partial PLYs
        from vn_pointcloudcompletion_tpu.data.ply import (
            read_ply_points,
            write_ply_points,
        )

        in_dir = synthetic_project / "raw"
        in_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(3):
            write_ply_points(
                str(in_dir / f"scan{i}.ply"),
                rng.standard_normal((700, 3)).astype(np.float32) * 0.2,
            )
        out_dir = synthetic_project / "pred"
        cli.main(["-n", runs[0], "--resume", "predict",
                  "-i", str(in_dir), "-o", str(out_dir)])
        outs = sorted(os.listdir(out_dir))
        assert outs == [f"scan{i}_completion.ply" for i in range(3)]
        pts = read_ply_points(str(out_dir / outs[0]))
        assert pts.shape[1] == 3 and len(pts) >= 1024
        assert np.isfinite(pts).all()

    @pytest.mark.slow
    def test_new_run_number_increments(self, synthetic_project):
        cli.main(["-n", "cli_smoke", "--mesh", "1", "train"])
        cli.main(["-n", "cli_smoke", "--mesh", "1", "train"])
        runs = sorted(os.listdir(synthetic_project / "experiments"))
        assert runs[0].endswith("_000") and runs[1].endswith("_001")

    @pytest.mark.slow
    def test_branch_from_epoch(self, synthetic_project):
        # enable numbered checkpoints, train epochs 0..1
        cfg = json.load(open(synthetic_project / "config.json"))
        cfg["checkpoint_every"] = 1
        json.dump(cfg, open(synthetic_project / "config.json", "w"))
        cli.main(["-n", "cli_smoke", "--mesh", "1", "-epochs", "1", "train"])
        exp_root = synthetic_project / "experiments"
        src_run = sorted(os.listdir(exp_root))[0]
        assert (exp_root / src_run / "models" / "model_1.ckpt").exists()

        # branch a new run from epoch 1 and train it to epoch 3
        # (NB: `-from 0` is the off-sentinel, as in the reference main.py:51)
        cli.main(["-n", src_run, "-from", "1", "--mesh", "1",
                  "-epochs", "3", "train"])
        runs = sorted(os.listdir(exp_root))
        assert len(runs) == 2
        new_run = runs[1]
        # the branch checkpoint was copied into the new run dir verbatim
        src_blob = (exp_root / src_run / "models" / "model_1.ckpt").read_bytes()
        new_blob = (exp_root / new_run / "models" / "model_1.ckpt").read_bytes()
        assert src_blob == new_blob
        # training continued from epoch 2 (branch+1) through 3
        import flax

        optim = flax.serialization.msgpack_restore(
            (exp_root / new_run / "optimizer" / "optim_last.ckpt").read_bytes()
        )
        assert optim["epoch"] == 3
        log_text = (exp_root / new_run / "train.log").read_text()
        assert "[BRANCH INFO]" in log_text
        assert "Epoch [002/003]" in log_text
        assert "Epoch [001/003]" not in log_text and "Epoch [000" not in log_text

    @pytest.mark.slow
    def test_branch_from_missing_checkpoint_fails(self, synthetic_project):
        cli.main(["-n", "cli_smoke", "--mesh", "1", "train"])  # no numbered ckpts
        src_run = sorted(os.listdir(synthetic_project / "experiments"))[0]
        with pytest.raises(FileNotFoundError, match="checkpoint_every"):
            cli.main(["-n", src_run, "-from", "7", "--mesh", "1", "train"])
