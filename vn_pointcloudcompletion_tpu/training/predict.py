"""Batch inference: raw partial PLYs in, dense completion PLYs out.

A serving surface the reference lacks (its only inference path is the
metric harness, ``test.py:33-203``): point ``main.py predict`` at a ``.ply``
file or a directory of them and get ``<stem>_completion.ply`` next to an
optional ``<stem>_coarse.ply`` for each input.  Inputs are resampled to the
model's 2048-point contract (``dataset/shapenet.py:98-102`` semantics) and
run through the jitted forward in ``batch_size`` chunks — the last chunk is
padded (static shapes keep one compile) and the padding rows dropped on
write.
"""

from __future__ import annotations

import logging
import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.data.ply import read_ply_points, write_ply_points
from vn_pointcloudcompletion_tpu.data.shapenet import N_PARTIAL, random_sample
from vn_pointcloudcompletion_tpu.models.composer import build_model
from vn_pointcloudcompletion_tpu.training.checkpoint import restore_checkpoint
from vn_pointcloudcompletion_tpu.training.state import create_train_state
from vn_pointcloudcompletion_tpu.utils.config import Config

log = logging.getLogger("test")


def _collect_inputs(input_path: str) -> List[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".ply")
        )
    return [input_path]


def predict(config: Config, input_path: str, output_dir: str,
            save_coarse: bool = False) -> List[str]:
    """Complete every partial cloud under ``input_path``; returns the list
    of written completion files."""
    paths = _collect_inputs(input_path)
    if not paths:
        raise FileNotFoundError(f"no .ply inputs under {input_path}")
    os.makedirs(output_dir, exist_ok=True)

    model = build_model(config)
    sample = jnp.zeros((config.batch_size, N_PARTIAL, 3), jnp.float32)
    state = create_train_state(
        model, config, 1, jax.random.key(config.seed), sample
    )
    restored = restore_checkpoint(config.exp_dir, state, "best")
    if restored is None:
        restored = restore_checkpoint(config.exp_dir, state, "last")
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {config.exp_dir}")
    state = restored[0]

    @jax.jit
    def forward(partial):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return state.apply_fn(variables, partial, None, train=False)

    rng = np.random.default_rng(config.seed)
    bs = config.batch_size
    written: List[str] = []
    for start in range(0, len(paths), bs):
        chunk = paths[start : start + bs]
        clouds = [
            random_sample(read_ply_points(p).astype(np.float32), N_PARTIAL, rng)
            for p in chunk
        ]
        n_real = len(clouds)
        while len(clouds) < bs:  # pad the last chunk to the jitted shape
            clouds.append(clouds[-1])
        coarse, fine = forward(jnp.asarray(np.stack(clouds)))
        pred = np.asarray(coarse if fine is None else fine)
        coarse_np = np.asarray(coarse)
        for i in range(n_real):
            stem = os.path.splitext(os.path.basename(chunk[i]))[0]
            out = os.path.join(output_dir, f"{stem}_completion.ply")
            write_ply_points(out, pred[i])
            written.append(out)
            if save_coarse and fine is not None:
                write_ply_points(
                    os.path.join(output_dir, f"{stem}_coarse.ply"),
                    coarse_np[i],
                )
        log.info(f"completed {start + n_real}/{len(paths)}")
    return written
