"""Checkpoint / resume at epoch granularity (reference train.py:72-87,252-277).

One serialized pytree per file, reference directory layout preserved:
``<exp_dir>/models/model_{best,last}.ckpt`` holds {params, batch_stats};
``<exp_dir>/optimizer/optim_{best,last}.ckpt`` holds
{epoch, optim_state_dict, best_metrics, best_epoch}.

Writes are atomic (tmp + rename) so a crash mid-save can always resume from
the previous epoch — the reference's failure model (SURVEY.md §5).
Encoder-subtree loading for ``enc_pretrained`` (model.py:29-39) restores just
``params['encoder']`` non-strictly.
"""

from __future__ import annotations

import os

import flax
import jax


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(exp_dir: str, state, epoch: int, best_metrics: float,
                    best_epoch: int, name: str) -> None:
    model_blob = flax.serialization.msgpack_serialize(
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            # pair marker: restore validates model/optim come from the same
            # epoch (a crash between the two renames could mismatch them)
            "epoch": int(epoch),
        }
    )
    optim_blob = flax.serialization.msgpack_serialize(
        {
            "epoch": epoch,
            "optim_state_dict": flax.serialization.to_state_dict(
                jax.device_get(state.opt_state)
            ),
            "step": int(state.step),
            "best_metrics": float(best_metrics),
            "best_epoch": int(best_epoch),
        }
    )
    model_path = os.path.join(exp_dir, "models", f"model_{name}.ckpt")
    optim_path = os.path.join(exp_dir, "optimizer", f"optim_{name}.ckpt")
    # write both tmps before either rename: shrinks the mismatch window to
    # the instant between the two renames, which the epoch markers catch
    with open(model_path + ".tmp", "wb") as f:
        f.write(model_blob)
    with open(optim_path + ".tmp", "wb") as f:
        f.write(optim_blob)
    os.replace(model_path + ".tmp", model_path)
    os.replace(optim_path + ".tmp", optim_path)


def restore_checkpoint(exp_dir: str, state, name: str = "last"):
    """Restore (state, epoch, best_metrics, best_epoch); None if absent."""
    model_path = os.path.join(exp_dir, "models", f"model_{name}.ckpt")
    optim_path = os.path.join(exp_dir, "optimizer", f"optim_{name}.ckpt")
    if not (os.path.exists(model_path) and os.path.exists(optim_path)):
        return None
    with open(model_path, "rb") as f:
        model_dict = flax.serialization.msgpack_restore(f.read())
    with open(optim_path, "rb") as f:
        optim_dict = flax.serialization.msgpack_restore(f.read())
    model_epoch = model_dict.get("epoch")  # absent in pre-marker checkpoints
    if model_epoch is not None and int(model_epoch) != int(optim_dict["epoch"]):
        raise RuntimeError(
            f"checkpoint pair mismatch: model_{name} is epoch {model_epoch} "
            f"but optim_{name} is epoch {optim_dict['epoch']} (crash between "
            "saves?) — resume from a numbered checkpoint or 'best'"
        )
    params = flax.serialization.from_state_dict(state.params, model_dict["params"])
    batch_stats = flax.serialization.from_state_dict(
        state.batch_stats, model_dict["batch_stats"]
    )
    opt_state = flax.serialization.from_state_dict(
        state.opt_state, optim_dict["optim_state_dict"]
    )
    state = state.replace(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=int(optim_dict.get("step", 0)),
    )
    return (
        state,
        int(optim_dict["epoch"]),
        float(optim_dict["best_metrics"]),
        int(optim_dict["best_epoch"]),
    )


def load_pretrained_encoder(state, path: str, enc_type: str = "vn_pointnet"):
    """Non-strict encoder-subtree load (reference model.py:29-39).

    Accepts the rebuild's msgpack checkpoints and reference torch ``.pth``
    state_dicts (mapped via training/torch_interop.py), so encoders
    pretrained with the reference are drop-in reusable.
    """
    if path.endswith((".pth", ".pt")):
        from vn_pointcloudcompletion_tpu.training import torch_interop

        sd = torch_interop.load_torch_state_dict(path)
        enc_p, enc_s = torch_interop.encoder_variables_from_torch(sd, enc_type)
        # non-strict merge (reference load_state_dict(strict=False),
        # model.py:33): converters may return partial trees — e.g.
        # vn_pointr's diverged coarse head keeps its init
        enc_p = torch_interop.merge_partial_tree(
            state.params["encoder"], enc_p
        )
        if state.batch_stats and "encoder" in state.batch_stats:
            enc_s = torch_interop.merge_partial_tree(
                state.batch_stats["encoder"], enc_s
            )
        blob = {"params": {"encoder": enc_p},
                "batch_stats": {"encoder": enc_s}}
    else:
        with open(path, "rb") as f:
            blob = flax.serialization.msgpack_restore(f.read())
    src = blob["params"].get("encoder", blob["params"])
    params = dict(state.params)
    params["encoder"] = flax.serialization.from_state_dict(
        state.params["encoder"], src
    )
    new_bs = state.batch_stats
    if "batch_stats" in blob and "encoder" in (blob["batch_stats"] or {}):
        bs = dict(state.batch_stats)
        bs["encoder"] = flax.serialization.from_state_dict(
            state.batch_stats["encoder"], blob["batch_stats"]["encoder"]
        )
        new_bs = bs
    return state.replace(params=flax.core.freeze(params) if isinstance(
        state.params, flax.core.FrozenDict) else params, batch_stats=new_bs)
