from vn_pointcloudcompletion_tpu.training.state import TrainState, create_train_state  # noqa: F401
from vn_pointcloudcompletion_tpu.training.steps import make_train_step, make_eval_step  # noqa: F401
from vn_pointcloudcompletion_tpu.training.checkpoint import save_checkpoint, restore_checkpoint  # noqa: F401
from vn_pointcloudcompletion_tpu.training.trainer import train  # noqa: F401
