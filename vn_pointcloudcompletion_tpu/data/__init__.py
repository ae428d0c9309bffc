from vn_pointcloudcompletion_tpu.data.ply import read_ply_points, write_ply_points  # noqa: F401
from vn_pointcloudcompletion_tpu.data.shapenet import ShapeNetPCN, CATEGORIES_PCN, CATEGORIES_PCN_NOVEL  # noqa: F401
from vn_pointcloudcompletion_tpu.data.synthetic import SyntheticCompletionDataset  # noqa: F401
from vn_pointcloudcompletion_tpu.data.pipeline import BatchLoader, device_prefetch  # noqa: F401
