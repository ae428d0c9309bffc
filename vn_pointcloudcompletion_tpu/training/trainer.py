"""Training harness — the full epoch loop (reference ``train.py:45-279``).

Surface parity: per-batch and per-epoch tensorboardX scalars
(``Loss/Batch/*``, ``Loss/Epoch/*``), log_frequency console logging, val-loop
l1_cd sums averaged over evaluated samples, one visualization PNG per epoch,
best+last checkpoints keyed on val total CD (train.py:252-265).

TPU-native structure: the step is one jitted XLA program; batches stream
through the double-buffered device prefetcher; with a
device mesh the same step runs data-parallel via shardings (parallel/).

Deliberately NOT replicated from the reference: the dead per-epoch ``alpha``
schedule (train.py:110-118, computed but never consumed).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.data.pipeline import BatchLoader, device_prefetch
from vn_pointcloudcompletion_tpu.data.shapenet import ShapeNetPCN
from vn_pointcloudcompletion_tpu.data.synthetic import SyntheticCompletionDataset
from vn_pointcloudcompletion_tpu.models.composer import build_model
from vn_pointcloudcompletion_tpu.training.checkpoint import (
    load_pretrained_encoder,
    restore_checkpoint,
    save_checkpoint,
)
from vn_pointcloudcompletion_tpu.training.state import create_train_state
from vn_pointcloudcompletion_tpu.training.steps import make_eval_step, make_train_step
from vn_pointcloudcompletion_tpu.utils.config import Config

log = logging.getLogger("train")
log_dataset = logging.getLogger("dataset")


def build_datasets(config: Config):
    if config.dataset == "synthetic":
        n = config.extra.get("synthetic_train_samples", 64)
        nv = config.extra.get("synthetic_val_samples", 16)
        kw = dict(
            n_partial=config.extra.get("synthetic_n_partial", 2048),
            n_complete=config.extra.get("synthetic_n_complete", 16384),
        )
        return (
            SyntheticCompletionDataset(n, seed=config.seed, **kw),
            SyntheticCompletionDataset(nv, seed=config.seed + 1, **kw),
        )
    root = os.path.join(config.data_path, "PCN")
    return (
        ShapeNetPCN(root, "train", config.category, seed=config.seed,
                    process_index=jax.process_index(),
                    process_count=jax.process_count()),
        ShapeNetPCN(root, "valid", config.category, seed=config.seed,
                    process_index=jax.process_index(),
                    process_count=jax.process_count()),
    )


def train(config: Config, resume: bool = False,
          max_epochs: Optional[int] = None, mesh=None) -> dict:
    """Run training; returns summary {best_epoch, best_cd, epochs_run}."""
    from tensorboardX import SummaryWriter

    from vn_pointcloudcompletion_tpu.nn.precision import (
        from_config_dtype,
        set_compute_dtype,
    )

    set_compute_dtype(from_config_dtype(config.dtype))

    if mesh is not None:
        # fail fast on pure-config errors before datasets/model are built
        n_data = mesh.shape["data"]
        if config.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size={config.batch_size} must be divisible by the "
                f"mesh's 'data' axis size {n_data}"
            )
    # batch_size is the GLOBAL batch; each process loads its local rows
    # (dataset shards by process_index, staged via stage_batch)
    n_proc = jax.process_count()
    if config.batch_size % max(n_proc, 1) != 0:
        raise ValueError(
            f"batch_size={config.batch_size} must be divisible by the "
            f"process count {n_proc}"
        )
    local_batch_size = config.batch_size // max(n_proc, 1)

    visual_dir = os.path.join(config.exp_dir, "visualizations")
    train_writer = SummaryWriter(os.path.join(config.exp_dir, "train"))
    val_writer = SummaryWriter(os.path.join(config.exp_dir, "val"))

    log_dataset.info("Loading Data...")
    train_dataset, val_dataset = build_datasets(config)
    train_loader = BatchLoader(
        train_dataset, local_batch_size, shuffle=True, seed=config.seed,
        num_workers=config.num_workers,
    )
    # a sharded mesh step needs every batch divisible by the mesh; val means
    # divide by the number of samples actually evaluated (== len(dataset)
    # whenever drop_last is off)
    val_loader = BatchLoader(
        val_dataset, local_batch_size, shuffle=False,
        num_workers=config.num_workers, drop_last=mesh is not None,
    )
    log_dataset.info("Dataset loaded!")

    model = build_model(config)
    steps_per_epoch = config.steps_per_epoch or max(len(train_loader), 1)

    rng = jax.random.key(config.seed)
    rng, init_rng = jax.random.split(rng)
    n_partial = config.extra.get("synthetic_n_partial", 2048)
    sample = jnp.zeros((config.batch_size, n_partial, 3), jnp.float32)
    state = create_train_state(model, config, steps_per_epoch, init_rng, sample)

    if config.enc_pretrained != "none":
        if not os.path.exists(config.enc_pretrained):
            # make_optimizer freezes the encoder whenever enc_pretrained is
            # set — silently skipping a typo'd path would train a frozen
            # RANDOM encoder for the whole run
            raise FileNotFoundError(
                f"enc_pretrained checkpoint not found: {config.enc_pretrained}"
            )
        state = load_pretrained_encoder(
            state, config.enc_pretrained, enc_type=config.enc_type
        )
        log.info(f"Loaded pretrained encoder from {config.enc_pretrained}")

    start_epoch, best_cd_l1, best_epoch_l1 = 0, 1e8, -1
    if resume:
        restored = restore_checkpoint(config.exp_dir, state, "last")
        if restored is not None:
            state, last_epoch, best_cd_l1, best_epoch_l1 = restored
            start_epoch = last_epoch + 1
            log.info(
                f"[RESUME INFO] resume ckpts @ {last_epoch} epoch"
                f" (best_metrics = {best_cd_l1 * 1e3})"
            )
        else:
            log.info("No checkpoint found; training from start")
    elif config.checkpoint:
        # branch-from-epoch: create_experiment copied model_{N}/optim_{N}
        # into this fresh run dir (reference utils/experiments.py:154-166)
        restored = restore_checkpoint(config.exp_dir, state, str(config.checkpoint))
        if restored is None:
            raise FileNotFoundError(
                f"branch checkpoint {config.checkpoint} missing from "
                f"{config.exp_dir}"
            )
        state, last_epoch, best_cd_l1, best_epoch_l1 = restored
        start_epoch = last_epoch + 1
        log.info(
            f"[BRANCH INFO] new run {config.run_name} branched from epoch "
            f"{last_epoch} checkpoint (best_metrics = {best_cd_l1 * 1e3})"
        )
    else:
        log.info(f"Start a brand new experiment: {config.run_name}")

    if mesh is not None:
        from vn_pointcloudcompletion_tpu.parallel.train_parallel import (
            make_parallel_steps, shard_state,
        )
        train_step, eval_step, batch_sharding = make_parallel_steps(config, mesh)
        state = shard_state(state, mesh)
    else:
        train_step = make_train_step(config)
        eval_step = make_eval_step(config)
        batch_sharding = None

    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log.info(f"Model total params: {n_params}")
    log.info(f"Producing coarse only: {config.only_coarse}")
    log.info(f"Producing num of coarse points: {config.num_coarse}")

    end_epoch = max_epochs if max_epochs is not None else config.max_epochs
    n_batches = len(train_loader)
    step_every = max(n_batches // max(config.log_frequency, 1), 1)
    rng_np = np.random.default_rng(config.seed + 17)

    epochs_run = 0
    pending_best = None  # (device-copied state, epoch) awaiting a disk flush
    for epoch in range(start_epoch, end_epoch + 1):
        # ---- train ----
        train_loader.set_epoch(epoch)
        t0 = time.time()
        # Metrics stay on device until a log point — a float() per step would
        # sync the async dispatch queue and stall the accelerator.
        step_metrics = []
        for i, (p, c) in enumerate(
            device_prefetch(train_loader, sharding=batch_sharding)
        ):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, p, c, step_rng)
            step_metrics.append(metrics)
            if (i + 1) % step_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                log.info(
                    "Training Epoch [{:03d}/{:03d}] - Iteration [{:03d}/{:03d}]:"
                    " coarse loss = {:.6f}, dense loss = {:.6f}, total loss = {:.6f}".format(
                        epoch, end_epoch, i + 1, n_batches,
                        m["coarse"] * 1e3, m["dense"] * 1e3, m["total"] * 1e3,
                    )
                )

        sums = {"coarse": 0.0, "dense": 0.0, "total": 0.0}
        n_skipped = 0
        for i, metrics in enumerate(step_metrics):
            train_step_idx = epoch * n_batches + i
            m = {k: float(v) for k, v in metrics.items()}
            n_skipped += int(m.pop("skipped", 0.0))
            for k in sums:
                sums[k] += m[k]
            train_writer.add_scalar("Loss/Batch/Coarse", m["coarse"], train_step_idx)
            train_writer.add_scalar("Loss/Batch/Dense", m["dense"], train_step_idx)
            train_writer.add_scalar("Loss/Batch/Total", m["total"], train_step_idx)

        denom = max(n_batches, 1)
        log.info(
            "Training Epoch [{:03d}/{:03d}]: Coarse = {:.6f}, Dense = {:.6f},"
            " Total = {:.6f} ({:.1f}s)".format(
                epoch, end_epoch, sums["coarse"] / denom * 1e3,
                sums["dense"] / denom * 1e3, sums["total"] / denom * 1e3,
                time.time() - t0,
            )
        )
        train_writer.add_scalar("Loss/Epoch/Coarse", sums["coarse"] / denom * 1e3, epoch)
        train_writer.add_scalar("Loss/Epoch/Dense", sums["dense"] / denom * 1e3, epoch)
        train_writer.add_scalar("Loss/Epoch/Total", sums["total"] / denom * 1e3, epoch)
        if n_skipped:
            # non-finite grads on some batch: the guarded step kept the
            # previous params (steps.py::guarded_update) — loud but non-fatal
            log.warning(
                f"Epoch {epoch}: skipped {n_skipped}/{n_batches} updates "
                "with non-finite gradients"
            )
            train_writer.add_scalar("Loss/Epoch/SkippedSteps", n_skipped, epoch)

        # ---- validate ----
        val = {"coarse": 0.0, "dense": 0.0}
        rand_iter = int(rng_np.integers(0, max(len(val_loader), 1)))
        viz = None
        n_evaluated = 0
        for i, (p, c) in enumerate(
            device_prefetch(val_loader, sharding=batch_sharding)
        ):
            rng, step_rng = jax.random.split(rng)
            out, clouds = eval_step(state, p, c, step_rng)
            val["coarse"] += float(out["coarse_sum"])
            val["dense"] += float(out["dense_sum"])
            n_evaluated += p.shape[0]
            if i == rand_iter and jax.process_count() == 1:
                # global arrays are not fully host-addressable multi-process
                viz = jax.tree.map(
                    lambda x: None if x is None else np.asarray(x), clouds
                )
        # mean over the samples actually evaluated (== len(dataset) unless a
        # mesh forces drop_last); zero evaluated batches must never become a
        # best_cd of 0.0 — that would poison checkpoint selection forever
        if n_evaluated == 0:
            log.warning(
                "validation evaluated 0 batches (dataset smaller than the "
                "mesh-divisible batch size); skipping best-checkpoint update"
            )
        n_val = max(n_evaluated, 1)
        val_coarse = val["coarse"] / n_val
        val_dense = val["dense"] / n_val
        # reference semantics: "total" double-counts coarse+dense sums
        val_total = val_coarse + val_dense if not config.only_coarse else val_coarse

        val_writer.add_scalar("Loss/Epoch/Coarse", val_coarse * 1e3, epoch)
        val_writer.add_scalar("Loss/Epoch/Dense", val_dense * 1e3, epoch)
        val_writer.add_scalar("Loss/Epoch/Total", val_total * 1e3, epoch)
        log.info(
            "Validate Epoch [{:03d}/{:03d}]: Coarse = {:.6f}, Dense = {:.6f},"
            " Total = {:.6f}".format(
                epoch, end_epoch, val_coarse * 1e3, val_dense * 1e3, val_total * 1e3
            )
        )

        if viz is not None and jax.process_index() == 0:
            _save_epoch_png(visual_dir, epoch, viz, config, rng_np)

        # ---- checkpoints ----
        # "last" every epoch is the reference's crash-recovery granularity
        # (train.py:268); checkpoint_last_every > 1 trades recovery
        # granularity for epoch time on hosts where the device->host
        # parameter pull is slow (e.g. a tunneled device)
        last_every = max(getattr(config, "checkpoint_last_every", 1), 1)
        if n_evaluated > 0 and val_total < best_cd_l1:
            best_epoch_l1, best_cd_l1 = epoch, val_total
            if last_every > 1:
                # Defer the disk write: early training improves val almost
                # every epoch, and each best-save pulls params+opt state to
                # host (~15 s through a tunneled device).  Keep the pending
                # best as a device-side copy (jnp.copy — no host transfer)
                # and flush it on the same cadence as "last", so disk best
                # and the best_metrics metadata stay mutually consistent at
                # every flush point.  Selection rule unchanged
                # (reference train.py:252-265).
                pending_best = (jax.tree.map(jnp.copy, state), epoch)
            else:
                save_checkpoint(config.exp_dir, state, epoch, best_cd_l1,
                                best_epoch_l1, "best")
                log.info(
                    f"Save checkpoint at {config.exp_dir}/models/model_best.ckpt"
                )
        if epoch % last_every == 0 or epoch == end_epoch:
            if pending_best is not None:
                b_state, b_epoch = pending_best
                save_checkpoint(config.exp_dir, b_state, b_epoch, best_cd_l1,
                                best_epoch_l1, "best")
                log.info(
                    f"Save checkpoint at {config.exp_dir}/models/model_best.ckpt"
                    f" (epoch {b_epoch}, deferred)"
                )
                pending_best = None
            save_checkpoint(config.exp_dir, state, epoch, best_cd_l1,
                            best_epoch_l1, "last")
        if config.checkpoint_every and epoch % config.checkpoint_every == 0:
            # numbered checkpoints are the branch points for `-from <epoch>`
            save_checkpoint(config.exp_dir, state, epoch, best_cd_l1,
                            best_epoch_l1, str(epoch))
        epochs_run += 1

    log.info(
        f"Best l1 cd model in epoch {best_epoch_l1}, the minimum l1 cd is"
        f" {best_cd_l1 * 1e3}"
    )
    train_writer.close()
    val_writer.close()
    return {
        "best_epoch": best_epoch_l1,
        "best_cd": best_cd_l1,
        "epochs_run": epochs_run,
    }


def _save_epoch_png(visual_dir, epoch, clouds, config, rng_np):
    from vn_pointcloudcompletion_tpu.visualization import plot_pcd_one_view

    partial, coarse, fine, complete = clouds
    index = int(rng_np.integers(0, partial.shape[0]))
    path = os.path.join(visual_dir, f"epoch_{epoch:03d}.png")
    lims = dict(xlim=(-0.35, 0.35), ylim=(-0.35, 0.35), zlim=(-0.35, 0.35))
    if config.only_coarse or fine is None:
        plot_pcd_one_view(
            path,
            [partial[index], coarse[index], complete[index]],
            ["Input", "Coarse", "Ground Truth"], **lims,
        )
    else:
        plot_pcd_one_view(
            path,
            [partial[index], coarse[index], fine[index], complete[index]],
            ["Input", "Coarse", "Dense", "Ground Truth"], **lims,
        )
