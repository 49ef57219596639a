from plslam_tpu.parallel.batch import BatchedTracker, make_mesh  # noqa: F401
