from vn_pointcloudcompletion_tpu.models.pcn import (  # noqa: F401
    PCN,
    VNPCN,
    VNPointNet,
    FoldingNet,
    VNFoldingNet,
    AttentionVNFoldingNet,
)
from vn_pointcloudcompletion_tpu.models.dgcnn import (  # noqa: F401
    DGCNNfps,
    VNDGCNNfps,
    DGCNN,
    TransformNet,
)
from vn_pointcloudcompletion_tpu.models.pointr import (  # noqa: F401
    DGCNNGrouper,
    VNDGCNNGrouper,
    VNPCTransformer,
)
from vn_pointcloudcompletion_tpu.models.composer import PCNNet, build_model  # noqa: F401
