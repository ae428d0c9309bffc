from vn_pointcloudcompletion_tpu.nn.vn import (  # noqa: F401
    EPS,
    VNLinear,
    VNLeakyReLU,
    VNLinearLeakyReLU,
    VNLinearAndLeakyReLU,
    VNBatchNorm,
    VNLayerNorm,
    VNMaxPool,
    VNStdFeature,
    mean_pool,
    torch_linear_init,
)
from vn_pointcloudcompletion_tpu.nn.attention import (  # noqa: F401
    VNAttention,
    VNBlock,
    ScalarAttention,
    CrossAttention,
    Mlp,
    Block,
    DecoderBlock,
    VNDecoderBlock,
)
