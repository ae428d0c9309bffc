"""Batched geometry primitives (TPU-native replacements for the reference's CUDA extensions).

Every op here is jit-able, batch-first, static-shape, and differentiable.
They replace, one for one, the native components of the reference
(see SURVEY.md §2a):

- ``chamfer_distance``      <- extensions/chamfer_distance + ChamferDistancePytorch (2D/3D/5D)
- ``earth_mover_distance``  <- extensions/earth_movers_distance (Fan's approx match)
- ``furthest_point_sample`` <- pointnet2_ops.furthest_point_sample + gather_operation
- ``knn``                   <- KNN_CUDA brute-force k-nearest-neighbours
- ``random_rotations`` etc. <- pytorch3d.transforms rotation augmentation
- ``folding_grid``          <- the decoders' folding seed constant
"""

from vn_pointcloudcompletion_tpu.ops.chamfer import chamfer_distance, chamfer_distance_reference
from vn_pointcloudcompletion_tpu.ops.emd import earth_mover_distance, approx_match
from vn_pointcloudcompletion_tpu.ops.fps import furthest_point_sample, fps_gather, fps
from vn_pointcloudcompletion_tpu.ops.knn import knn, pairwise_sqdist, graph_feature, vn_graph_feature
from vn_pointcloudcompletion_tpu.ops.rotations import (
    random_rotations,
    random_z_rotations,
    rotate_points,
)
from vn_pointcloudcompletion_tpu.ops.grid import folding_grid_2d, folding_grid_3d

__all__ = [
    "chamfer_distance",
    "chamfer_distance_reference",
    "earth_mover_distance",
    "approx_match",
    "furthest_point_sample",
    "fps_gather",
    "fps",
    "knn",
    "pairwise_sqdist",
    "graph_feature",
    "vn_graph_feature",
    "random_rotations",
    "random_z_rotations",
    "rotate_points",
    "folding_grid_2d",
    "folding_grid_3d",
]
