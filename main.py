#!/usr/bin/env python
"""CLI entry point (reference ``main.py:23-123``).

Subcommands ``train`` / ``overfit`` / ``test`` / ``predict`` (batch
inference on raw PLYs — beyond the reference's surface); flags
``-n/--name``, ``--resume``, ``--ckpt_path``, ``-from/--from_epoch``,
``-epochs``.
``.env`` supplies OUTPUT_DIR / DATA_PATH before config loading, exactly like
the reference's pre-import dotenv (main.py:10).
"""

from __future__ import annotations

import argparse
import os
import sys


def _load_dotenv(path: str = ".env") -> None:
    if not os.path.exists(path):
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            os.environ.setdefault(key.strip(), value.strip().strip('"').strip("'"))


def main(argv=None):
    _load_dotenv()

    parser = argparse.ArgumentParser("vn_pointcloudcompletion_tpu")
    parser.add_argument("-n", "--name", type=str, default=None,
                        help="experiment name (resume: experiment dir name)")
    parser.add_argument("--resume", action="store_true",
                        help="resume training from the named experiment")
    parser.add_argument("--ckpt_path", type=str, default=None,
                        help="path of a pretrained model checkpoint")
    parser.add_argument("-from", "--from_epoch", type=str, default=0,
                        help="branch a NEW run from -n <src run>'s numbered "
                             "checkpoint: an epoch, 'best' or 'last'")
    parser.add_argument("-epochs", "--epochs", type=int, default=None,
                        help="override max epochs")
    parser.add_argument("--save", action="store_true",
                        help="test: export predicted clouds as .ply; "
                             "predict: also write the coarse clouds")
    parser.add_argument("--emd", action="store_true",
                        help="test: also report per-point EMD (test.py:139-182)")
    parser.add_argument("--novel", action="store_true",
                        help="test: evaluate the 8 novel (unseen) categories"
                             " (reference test.py:19, branch commented out)")
    parser.add_argument("--mesh", type=int, default=None,
                        help="train/overfit only: data-parallel over N "
                             "devices (0 = all available; default: single "
                             "device)")
    parser.add_argument("-i", "--input", type=str, default=None,
                        help="predict: a partial .ply file or a directory "
                             "of them")
    parser.add_argument("-o", "--output", type=str, default=None,
                        help="predict: output directory (default "
                             "<exp_dir>/predictions)")
    parser.add_argument("command",
                        choices=["train", "overfit", "test", "predict"])
    args = parser.parse_args(argv)

    from vn_pointcloudcompletion_tpu.utils.config import load_config, store_config
    from vn_pointcloudcompletion_tpu.utils.experiments import (
        configure_logging,
        create_experiment,
        setup_loggers,
    )

    configure_logging()

    if args.command in ("test", "predict") and not args.resume:
        # without --resume this would create a fresh empty experiment dir
        # and then crash on the missing checkpoint
        parser.error(
            f"{args.command} requires --resume with -n <existing experiment>"
        )
    if args.command == "predict" and not args.input:
        parser.error("predict requires -i/--input <.ply file or directory>")

    branching = args.from_epoch not in (0, "0", None, "")
    if args.resume:
        if args.name is None:
            parser.error("--resume requires -n <experiment dir name>")
        config = load_config(args.name)
    elif branching:
        # -from: new run seeded from an existing run's numbered checkpoint
        # (reference main.py:40-46 + utils/experiments.py:154-166)
        if args.name is None:
            parser.error("-from requires -n <source experiment dir name>")
        config = load_config(args.name)  # source run snapshot (has exp_dir)
        fe = args.from_epoch
        config.checkpoint = int(fe) if str(fe).isdigit() else str(fe)
        config = create_experiment(config)
    else:
        config = load_config(None)
        if args.name:
            config.name = args.name
        config.checkpoint = 0
        config = create_experiment(config)

    if args.epochs is not None:
        config.max_epochs = args.epochs
    if args.ckpt_path is not None:
        config.enc_pretrained = args.ckpt_path
    if args.command == "overfit":
        config.overfit = True

    store_config(config)
    setup_loggers(
        args.command,
        os.path.join(config.exp_dir, f"{args.command}.log"),
        ["train", "dataset", "test"],
    )

    if args.command in ("train", "overfit"):
        import jax

        from vn_pointcloudcompletion_tpu.training.trainer import train

        mesh = None
        # mesh mode only on request: multi-device hosts stay single-chip
        # unless --mesh is passed (0 = all devices, N = first N)
        if args.mesh is None:
            n_dev = 1
        else:
            n_dev = args.mesh or len(jax.devices())
        if n_dev > 1:
            from vn_pointcloudcompletion_tpu.parallel import make_mesh

            mesh = make_mesh(jax.devices()[:n_dev])
        if config.overfit:
            # overfit: single repeated batch, useful as a correctness probe.
            # Forces the synthetic dataset — the sample-count extras below
            # are only read on that branch (trainer.build_datasets), so on
            # shapenet this command would silently be a full training run.
            config.dataset = "synthetic"
            config.extra["synthetic_train_samples"] = config.batch_size
            config.extra["synthetic_val_samples"] = config.batch_size
        train(config, resume=args.resume, mesh=mesh)
    elif args.command == "predict":
        from vn_pointcloudcompletion_tpu.training.predict import predict

        out_dir = args.output or os.path.join(config.exp_dir, "predictions")
        written = predict(config, args.input, out_dir,
                          save_coarse=args.save)
        print(f"wrote {len(written)} completions -> {out_dir}")
    else:
        from vn_pointcloudcompletion_tpu.training.evaluate import evaluate

        if args.mesh is not None:
            print("warning: --mesh applies to train/overfit only; "
                  "test runs single-device", file=sys.stderr)
        categories = None
        if args.novel:
            from vn_pointcloudcompletion_tpu.data.shapenet import (
                CATEGORIES_PCN_NOVEL,
            )

            categories = list(CATEGORIES_PCN_NOVEL)
        evaluate(config, save=args.save, with_emd=args.emd,
                 categories=categories)


if __name__ == "__main__":
    main()
