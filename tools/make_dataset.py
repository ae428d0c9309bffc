#!/usr/bin/env python
"""Build a complete PCN-layout dataset with the repo's own offline tools.

Chain (the reference's sample/ + render/ pipeline, rebuilt):

  tools/gen_shapes.py      procedural OBJ meshes per category
  tools/mesh_sampling      area-weighted surface sampling -> complete .ply
  data/render.py           z-buffer partial views -> partial .ply (8 views
                           for train, 1 for valid/test)
  {split}.list             category_id/model_id lines (dataset/shapenet.py)

Usage:
  python tools/make_dataset.py data/PCN \
      --categories airplane chair table --train 80 --valid 8 --test 8
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vn_pointcloudcompletion_tpu.data.ply import read_ply_points, write_ply_points
from vn_pointcloudcompletion_tpu.data.render import generate_partials
from vn_pointcloudcompletion_tpu.data.shapenet import CAT2ID

TOOLS = os.path.dirname(os.path.abspath(__file__))
MESH_SAMPLING = os.path.join(TOOLS, "mesh_sampling")


def build_mesh_sampling():
    if not os.path.exists(MESH_SAMPLING):
        subprocess.run(["make", "-C", TOOLS, "mesh_sampling"], check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="output dataset root (e.g. data/PCN)")
    ap.add_argument("--categories", nargs="+",
                    default=["airplane", "chair", "table"])
    ap.add_argument("--train", type=int, default=80)
    ap.add_argument("--valid", type=int, default=8)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--novel", type=int, default=0,
                    help="also build a test_novel split with this many "
                         "models per novel category (reference test.py:19; "
                         "consumed by `main.py test --novel`)")
    ap.add_argument("--novel_categories", nargs="+",
                    default=["bus", "bed", "bookshelf", "bench", "guitar",
                             "motorbike", "skateboard", "pistol"])
    ap.add_argument("--n_complete", type=int, default=16384)
    ap.add_argument("--n_views", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from tools.gen_shapes import generate, write_obj  # noqa: E402

    build_mesh_sampling()
    splits = [
        ("train", args.train, args.categories),
        ("valid", args.valid, args.categories),
        ("test", args.test, args.categories),
    ]
    if args.novel:
        splits.append(("test_novel", args.novel, args.novel_categories))
    with tempfile.TemporaryDirectory() as tmp:
        for split, count, categories in splits:
            lines = []
            for cat in categories:
                cat_id = CAT2ID[cat]
                comp_dir = os.path.join(args.root, split, "complete", cat_id)
                part_dir = os.path.join(args.root, split, "partial", cat_id)
                os.makedirs(comp_dir, exist_ok=True)
                os.makedirs(part_dir, exist_ok=True)
                # disjoint seed ranges per split so no model leaks across
                base = {"train": 0, "valid": 100000, "test": 200000,
                        "test_novel": 300000}[split]
                base += args.seed
                for i in range(count):
                    model_id = f"{cat}_{split}_{i:04d}"
                    # crc32, not hash(): str hashes are salted per process
                    # (PYTHONHASHSEED), which would make --seed unreproducible
                    seed = base + i * 7 + zlib.crc32(cat.encode()) % 1000
                    v, f = generate(cat, seed)
                    obj = os.path.join(tmp, f"{model_id}.obj")
                    write_obj(obj, v, f)
                    comp_ply = os.path.join(comp_dir, f"{model_id}.ply")
                    subprocess.run(
                        [MESH_SAMPLING, obj, comp_ply,
                         "-n_samples", str(args.n_complete),
                         "-seed", str(seed)],
                        check=True, capture_output=True,
                    )
                    complete = read_ply_points(comp_ply)
                    partials = generate_partials(
                        complete, n_views=args.n_views, seed=seed + 1,
                    )
                    if split == "train":
                        for k, part in enumerate(partials):
                            write_ply_points(
                                os.path.join(part_dir, f"{model_id}_{k}.ply"),
                                part)
                    else:
                        write_ply_points(
                            os.path.join(part_dir, f"{model_id}.ply"),
                            partials[0])
                    lines.append(f"{cat_id}/{model_id}")
                print(f"{split}/{cat}: {count} models done", flush=True)
            if not lines:
                continue  # zero-count split: don't write an empty list file
            with open(os.path.join(args.root, f"{split}.list"), "w") as fh:
                fh.write("\n".join(lines) + "\n")
    print(f"dataset complete at {args.root}")


if __name__ == "__main__":
    main()
