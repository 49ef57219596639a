from plslam_tpu.solvers.pose import PointObs, LineObs, pose_optimization  # noqa: F401
