"""Line segment detection (LSD).

The reference wraps cv::line_descriptor::LSDDetector (src/LineExtractor.cc,
SURVEY.md §3.1). LSD's region-growing is data-dependent and host-friendly;
per SURVEY.md §10.3e the v0 device story is: host LSD behind a fixed-capacity
op signature (the rest of the line pipeline — LBD descriptors, matching,
residuals — is all device code). A Pallas fixed-iteration variant is a later
phase.

Output contract: fixed-capacity arrays (sp, ep, valid) with endpoints in
pixel coords, segments sorted by length (longest first), short segments
dropped (min_length_frac of the image diagonal — the reference's
length/octave filter).
"""

from __future__ import annotations

import numpy as np

from plslam_tpu import constants as C


def detect_lines_host(
    gray: np.ndarray,
    capacity: int = C.MAX_LINES,
    min_length_frac: float = C.MIN_LINE_LENGTH_FRAC,
):
    """gray f32[H, W] (0..255) -> (sp f32[L, 2], ep f32[L, 2], valid bool[L]).

    Host-side cv2 LSD (the reference's own backend); falls back to an
    empty set if cv2 is unavailable."""
    sp = np.zeros((capacity, 2), np.float32)
    ep = np.zeros((capacity, 2), np.float32)
    valid = np.zeros(capacity, bool)
    try:
        import cv2
    except ImportError:  # pragma: no cover
        return sp, ep, valid

    lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_STD)
    lines = lsd.detect(gray.astype(np.uint8))[0]
    if lines is None or len(lines) == 0:
        return sp, ep, valid
    segs = lines.reshape(-1, 4)
    h, w = gray.shape
    min_len = min_length_frac * float(np.hypot(h, w))
    lengths = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
    keep = lengths >= min_len
    segs, lengths = segs[keep], lengths[keep]
    order = np.argsort(-lengths)[:capacity]
    n = len(order)
    sp[:n] = segs[order, :2]
    ep[:n] = segs[order, 2:]
    valid[:n] = True
    return sp, ep, valid
