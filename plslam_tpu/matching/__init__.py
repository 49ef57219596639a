from plslam_tpu.matching.points import (  # noqa: F401
    hamming_matrix,
    match_descriptors,
    rotation_consistency_mask,
    search_by_projection,
)
