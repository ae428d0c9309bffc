#!/usr/bin/env python
"""Offline dataset tool: generate the PCN layout from complete clouds.

For each complete .ply under ``<root>/<split>/complete/<cat>/<model>.ply``,
renders ``n_views`` z-buffer partial scans into
``<root>/<split>/partial/<cat>/<model>_<k>.ply`` (train) or ``<model>.ply``
(single-view splits) — the directory contract of dataset/shapenet.py.

Replaces the reference's Blender + OpenEXR pipeline (render/render_depth.py,
render/process_exr.py) with the NumPy z-buffer renderer in data/render.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from vn_pointcloudcompletion_tpu.data.ply import read_ply_points, write_ply_points
from vn_pointcloudcompletion_tpu.data.render import generate_partials


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="dataset root (contains <split>/complete/...)")
    ap.add_argument("--split", default="train")
    ap.add_argument("--n_views", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    complete_root = os.path.join(args.root, args.split, "complete")
    partial_root = os.path.join(args.root, args.split, "partial")
    n_models = 0
    for cat in sorted(os.listdir(complete_root)):
        os.makedirs(os.path.join(partial_root, cat), exist_ok=True)
        for fname in sorted(os.listdir(os.path.join(complete_root, cat))):
            if not fname.endswith(".ply"):
                continue
            model_id = fname[:-4]
            complete = read_ply_points(os.path.join(complete_root, cat, fname))
            partials = generate_partials(
                complete, n_views=args.n_views,
                # crc32, not hash(): str hashes are salted per process
                # (PYTHONHASHSEED), which would defeat --seed reproducibility
                seed=args.seed
                + zlib.crc32(f"{cat}/{model_id}".encode()) % (2**31),
            )
            if args.split == "train":
                for k, part in enumerate(partials):
                    write_ply_points(
                        os.path.join(partial_root, cat, f"{model_id}_{k}.ply"),
                        part,
                    )
            else:
                write_ply_points(
                    os.path.join(partial_root, cat, f"{model_id}.ply"),
                    partials[0],
                )
            n_models += 1
    print(f"rendered partials for {n_models} models -> {partial_root}")


if __name__ == "__main__":
    main()
