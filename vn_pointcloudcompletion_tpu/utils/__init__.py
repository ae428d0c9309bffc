from vn_pointcloudcompletion_tpu.utils.config import Config, load_config, store_config  # noqa: F401
