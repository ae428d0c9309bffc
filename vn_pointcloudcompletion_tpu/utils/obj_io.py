"""Voxel-grid -> OBJ mesh export (reference ``utils/voxel_util.py:22-66``).

Test-time artifact export: occupied voxels become scaled cubes; with
``surface_view`` only voxels with an exposed face are emitted.
"""

from __future__ import annotations

import numpy as np

_CUBE_VERTS = np.array(
    [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
     [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
)
_CUBE_FACES = np.array(
    [[0, 1, 2], [1, 3, 2], [2, 3, 6], [3, 7, 6], [0, 2, 6], [0, 6, 4],
     [0, 5, 1], [0, 4, 5], [6, 7, 5], [6, 5, 4], [1, 7, 3], [1, 5, 7]]
) + 1


def voxel2mesh(voxels: np.ndarray, surface_view: bool = True,
               threshold: float = 0.3):
    """Occupied voxels -> (verts, faces) cube soup (reference :22-47)."""
    voxels = np.asarray(voxels).astype(np.float32)
    scale = 0.01
    cube_dist_scale = 1.1
    verts, faces = [], []
    curr_vert = 0
    positions = np.where(voxels > threshold)
    voxels[positions] = 1
    for i, j, k in zip(*positions):
        if not surface_view or np.sum(voxels[i - 1:i + 2, j - 1:j + 2,
                                             k - 1:k + 2]) < 27:
            verts.extend(
                scale * (_CUBE_VERTS + cube_dist_scale * np.array([[i, j, k]]))
            )
            faces.extend(_CUBE_FACES + curr_vert)
            curr_vert += len(_CUBE_VERTS)
    return np.array(verts), np.array(faces)


def write_obj(filename: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """reference :50-61."""
    with open(filename, "w") as f:
        f.write("g\n# %d vertex\n" % len(verts))
        for vert in verts:
            f.write("v %f %f %f\n" % tuple(vert))
        f.write("# %d faces\n" % len(faces))
        for face in faces:
            f.write("f %d %d %d\n" % tuple(face))


def voxel2obj(filename: str, pred: np.ndarray, surface_view: bool = True) -> None:
    verts, faces = voxel2mesh(pred, surface_view)
    write_obj(filename, verts, faces)
