from vn_pointcloudcompletion_tpu.visualization.visualization import plot_pcd_one_view  # noqa: F401
