"""Experiment directory management + logging (reference ``utils/experiments.py``).

Creates ``<OUTPUT_DIR>/MM-DD_<name>_NNN/{models,optimizer,visualizations,
train,val}`` run dirs with auto-incremented run numbers (reference :103-171)
and attaches per-run file handlers to the named loggers (reference :52-87).
"""

from __future__ import annotations

import logging
import logging.config
import os
import shutil
from datetime import datetime
from typing import List, Optional

from vn_pointcloudcompletion_tpu.utils.config import Config, output_dir

LOGGING_CONFIG = {
    "version": 1,
    "disable_existing_loggers": False,
    "formatters": {
        "standard": {
            "format": "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
        }
    },
    "handlers": {
        "console": {
            "class": "logging.StreamHandler",
            "formatter": "standard",
            "level": "INFO",
        }
    },
    "loggers": {
        "train": {"handlers": ["console"], "level": "INFO", "propagate": False},
        "dataset": {"handlers": ["console"], "level": "INFO", "propagate": False},
        "test": {"handlers": ["console"], "level": "INFO", "propagate": False},
    },
}


def configure_logging() -> None:
    logging.config.dictConfig(LOGGING_CONFIG)


def setup_loggers(command: str, log_path: Optional[str] = None,
                  logger_names: Optional[List[str]] = None) -> None:
    """Attach a file handler to the named loggers (reference :52-87)."""
    if log_path is None:
        log_path = (
            f"./logs/{command}/{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}.log"
        )
        os.makedirs(os.path.dirname(log_path), exist_ok=True)
    handler = logging.FileHandler(filename=log_path)
    handler.setLevel("DEBUG")
    handler.setFormatter(
        logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    )
    for name in logger_names or [command]:
        logging.getLogger(name).addHandler(handler)


def get_num_params_total(params) -> int:
    """Total parameter count of a pytree (reference :299-302)."""
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))


def get_num_params(params) -> dict:
    """Coarse/dense split by top-level subtree (reference :304-318)."""
    import jax

    total = get_num_params_total(params)
    dense = get_num_params_total(params.get("decoder", {}))
    return {"coarse": total - dense, "dense": total}


def create_experiment(config: Config) -> Config:
    """Create the next ``MM-DD_<name>_NNN`` run dir (reference :103-171).

    When ``config.checkpoint`` is set (``-from N`` / ``-from best``), the
    numbered checkpoint pair is copied from the source run (the
    ``config.exp_dir`` the loaded snapshot points at) into the new run dir —
    the reference's branch-from-epoch semantics (reference :154-166; upstream
    the copied files were never written, see trainer checkpoint_every).
    """
    experiment_name = f"{datetime.now().strftime('%m-%d')}_{config.name}"
    out = output_dir()
    os.makedirs(out, exist_ok=True)

    prev = [-1]
    for entry in os.listdir(out):
        if entry[:-4] == experiment_name:  # strips "_NNN"
            try:
                prev.append(int(entry[len(experiment_name) + 1 :]))
            except ValueError:
                pass
    num = max(prev) + 1

    run_name = f"{experiment_name}_{num:03d}"
    exp_dir = os.path.join(out, run_name)
    for sub in ("", "models", "optimizer", "visualizations", "train", "val"):
        os.makedirs(os.path.join(exp_dir, sub), exist_ok=True)

    if getattr(config, "checkpoint", 0):
        name = str(config.checkpoint)
        old_dir = config.exp_dir
        for sub, fname in (
            ("models", f"model_{name}.ckpt"),
            ("optimizer", f"optim_{name}.ckpt"),
        ):
            src = os.path.join(old_dir, sub, fname)
            if not os.path.isfile(src):
                raise FileNotFoundError(
                    f"-from {name}: {src} not found — numbered checkpoints "
                    f"are written when the source run sets checkpoint_every > 0"
                )
            shutil.copy(src, os.path.join(exp_dir, sub, fname))

    config.run_name = run_name
    config.exp_dir = exp_dir
    return config
