from plslam_tpu.io.trajectory import save_trajectory_tum  # noqa: F401
