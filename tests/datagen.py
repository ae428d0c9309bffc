"""Miniature ShapeNet-PCN directory builder shared by the data-layer and
end-to-end tests: split ``.list`` files, 8-view train partials, single-view
valid/test partials, binary PLYs — the on-disk contract of
``data/shapenet.py`` (reference ``dataset/shapenet.py:13-102``)."""

import os

import numpy as np

from vn_pointcloudcompletion_tpu.data.ply import write_ply_points


def build_mini_pcn(root, splits=("train", "valid", "test"), n_models=3,
                   cats=("02691156",), n_partial=700, n_complete=20000,
                   scale=1.0, seed=0):
    rng = np.random.default_rng(seed)
    for split in splits:
        lines = []
        for cat in cats:
            os.makedirs(os.path.join(root, split, "partial", cat),
                        exist_ok=True)
            os.makedirs(os.path.join(root, split, "complete", cat),
                        exist_ok=True)
            for i in range(n_models):
                mid = f"model{i}"
                lines.append(f"{cat}/{mid}")
                if split == "train":
                    for v in range(8):
                        write_ply_points(
                            os.path.join(root, split, "partial", cat,
                                         f"{mid}_{v}.ply"),
                            rng.standard_normal((n_partial, 3)).astype(
                                np.float32) * scale,
                        )
                else:
                    write_ply_points(
                        os.path.join(root, split, "partial", cat,
                                     f"{mid}.ply"),
                        rng.standard_normal((n_partial, 3)).astype(
                            np.float32) * scale,
                    )
                write_ply_points(
                    os.path.join(root, split, "complete", cat, f"{mid}.ply"),
                    rng.standard_normal((n_complete, 3)).astype(
                        np.float32) * scale,
                )
        with open(os.path.join(root, f"{split}.list"), "w") as f:
            f.write("\n".join(lines))
