"""vn_pointcloudcompletion_tpu — TPU-native vector-neuron point-cloud completion.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
ChenBarryHu/VN_PointCloudCompletion (rotation-equivariant point-cloud
completion on ShapeNet-PCN): VN layer zoo, PCN / DGCNN / PoinTr encoders,
FoldingNet decoders, Chamfer/EMD/DCD losses, SO(3) augmentation, and a
config.json-compatible experiment harness — designed for TPU (MXU-friendly
batched einsums, static shapes, `shard_map` data parallelism) rather than
translated from the reference's CUDA/torch implementation.
"""

__version__ = "0.1.0"

from vn_pointcloudcompletion_tpu.utils.config import Config, load_config  # noqa: F401
