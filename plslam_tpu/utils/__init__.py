from plslam_tpu.utils.precision import mm  # noqa: F401
