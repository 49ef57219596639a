from plslam_tpu.pipeline.tracking import Tracker, TrackState, StepOut  # noqa: F401
