"""Device compute ops (JAX/XLA now, Pallas for the hot ones).

These replace the reference's per-pixel C++ loops:
  * pyramid.py      — ORBextractor::ComputePyramid + GaussianBlur
  * fast.py         — cv::FAST per 30px cell with threshold fallback
                      (src/ORBextractor.cc §ComputeKeyPointsOctTree ~750)
  * select.py       — DistributeOctTree quadtree -> grid-cell top-1 + top-k
                      (TPU-idiomatic equivalent, SURVEY.md §10.3c)
  * patches.py      — keypoint patch gathers
  * orientation.py  — IC_Angle (src/ORBextractor.cc ~70)
  * brief.py        — computeOrbDescriptor steered BRIEF (~100)
  * hamming.py      — ORBmatcher::DescriptorDistance as MXU bit-matmul
"""
