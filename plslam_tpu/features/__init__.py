from plslam_tpu.features.orb import FeatureSet, ORBExtractor  # noqa: F401
