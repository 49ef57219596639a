from plslam_tpu.slammap.state import MapState, empty_map  # noqa: F401
