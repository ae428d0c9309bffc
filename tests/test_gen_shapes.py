"""Procedural mesh builders + dataset-build plumbing (tools/gen_shapes.py,
tools/make_dataset.py) — the rebuild of the reference's offline data tools
(``sample/mesh_sampling.cpp``, ``render/render_depth.py``).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gen_shapes import BUILDERS, generate  # noqa: E402
from vn_pointcloudcompletion_tpu.data.shapenet import (  # noqa: E402
    CATEGORIES_PCN,
    CATEGORIES_PCN_NOVEL,
)


class TestBuilders:
    def test_every_pcn_category_has_a_builder(self):
        # all 8 seen + all 8 novel categories (reference test.py:18-19)
        for cat in CATEGORIES_PCN + CATEGORIES_PCN_NOVEL:
            assert cat in BUILDERS, cat

    @pytest.mark.parametrize("cat", sorted(BUILDERS))
    def test_valid_normalised_mesh(self, cat):
        for seed in (0, 3):
            v, f = generate(cat, seed)
            assert np.isfinite(v).all()
            assert f.ndim == 2 and f.shape[1] == 3
            assert f.min() >= 0 and f.max() < len(v)
            ext = v.max(axis=0) - v.min(axis=0)
            # ShapeNet-like normalisation: longest side 0.9, centred
            np.testing.assert_allclose(ext.max(), 0.9, atol=1e-6)
            center = (v.max(axis=0) + v.min(axis=0)) / 2
            np.testing.assert_allclose(center, 0.0, atol=1e-6)
            # no degenerate triangles (all three corners distinct)
            tri = v[f]
            a = np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0],
                                        tri[:, 2] - tri[:, 0]), axis=1)
            assert (a > 0).any()

    def test_seeded_reproducible(self):
        v1, f1 = generate("guitar", 42)
        v2, f2 = generate("guitar", 42)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(f1, f2)


@pytest.mark.slow
def test_make_dataset_with_novel_split(tmp_path):
    """End-to-end tiny build including the test_novel split: list files,
    directory layout, and view counts must match dataset/shapenet.py's
    expectations (one view for non-train splits)."""
    root = str(tmp_path / "PCN")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_dataset.py"), root,
         "--categories", "airplane", "--train", "1", "--valid", "1",
         "--test", "1", "--novel", "1",
         "--novel_categories", "bus", "guitar",
         "--n_complete", "2048", "--n_views", "2"],
        check=True, cwd=REPO, capture_output=True,
    )
    for split in ("train", "valid", "test", "test_novel"):
        assert os.path.exists(os.path.join(root, f"{split}.list")), split
    novel = open(os.path.join(root, "test_novel.list")).read().split()
    assert len(novel) == 2  # one model for each of the two novel categories
    for line in novel:
        cat_id, model_id = line.split("/")
        assert os.path.exists(os.path.join(
            root, "test_novel", "complete", cat_id, model_id + ".ply"))
        # non-train splits carry exactly one (unsuffixed) partial view
        assert os.path.exists(os.path.join(
            root, "test_novel", "partial", cat_id, model_id + ".ply"))

    from vn_pointcloudcompletion_tpu.data.shapenet import ShapeNetPCN

    ds = ShapeNetPCN(root, "test_novel", category="all")
    assert len(ds) == 2
    p, c = ds[0]
    assert p.shape == (2048, 3) and c.shape == (16384, 3)
