from plslam_tpu.loopclosing.vocab import Vocabulary  # noqa: F401
