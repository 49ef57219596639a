from plslam_tpu.eval.ate import ate_rmse, rpe_rmse  # noqa: F401
