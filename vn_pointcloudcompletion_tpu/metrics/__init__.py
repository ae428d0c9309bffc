from vn_pointcloudcompletion_tpu.metrics.losses import (  # noqa: F401
    cd_loss_l1,
    cd_loss_l2,
    emd_loss,
    calc_cd,
    calc_dcd,
    fscore_from_dists,
)
from vn_pointcloudcompletion_tpu.metrics.metrics import (  # noqa: F401
    l1_cd,
    l2_cd,
    emd_sum,
    f_score,
    voxel_iou,
    points_to_voxels,
)
