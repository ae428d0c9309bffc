from vn_pointcloudcompletion_tpu.parallel.mesh import make_mesh, data_sharding, replicated  # noqa: F401
from vn_pointcloudcompletion_tpu.parallel.train_parallel import (  # noqa: F401
    make_parallel_steps,
    shard_state,
)
