"""Batched Lie-group + camera geometry (pure JAX).

Replaces the reference's scattered Eigen/g2o math (src/Converter.cc,
Thirdparty/g2o se3quat.h / sim3.h) with one batched functional library.
All functions broadcast over leading batch dimensions.
"""

from plslam_tpu.geometry import camera, se3, sim3  # noqa: F401
