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

import ctypes
import functools
import subprocess
from pathlib import Path

import numpy as np

from plslam_tpu import constants as C

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"


@functools.lru_cache(maxsize=1)
def _native_lib():
    """Load (building if needed) the native C++ LSD (native/lsd.cpp)."""
    so = _NATIVE_DIR / "build" / "liblsd.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.lsd_detect.restype = ctypes.c_int
    lib.lsd_detect.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    return lib


def detect_lines_native(
    gray: np.ndarray,
    capacity: int = C.MAX_LINES,
    min_length_frac: float = C.MIN_LINE_LENGTH_FRAC,
    angle_tol_deg: float = 22.5,
    density_th: float = 0.5,
    grad_th: float = 5.0,
):
    """Native C++ LSD (native/lsd.cpp). Returns None if the lib is missing."""
    lib = _native_lib()
    if lib is None:
        return None
    h, w = gray.shape
    img = np.ascontiguousarray(gray, np.float32)
    out = np.zeros((capacity, 4), np.float32)
    min_len = min_length_frac * float(np.hypot(h, w))
    n = lib.lsd_detect(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), capacity,
        ctypes.c_float(min_len), ctypes.c_float(angle_tol_deg),
        ctypes.c_float(density_th), ctypes.c_float(grad_th),
    )
    sp = np.zeros((capacity, 2), np.float32)
    ep = np.zeros((capacity, 2), np.float32)
    valid = np.zeros(capacity, bool)
    sp[:n] = out[:n, :2]
    ep[:n] = out[:n, 2:]
    valid[:n] = True
    return sp, ep, valid


def detect_lines_host(
    gray: np.ndarray,
    capacity: int = C.MAX_LINES,
    min_length_frac: float = C.MIN_LINE_LENGTH_FRAC,
    prefer_native: bool = True,
):
    """gray f32[H, W] (0..255) -> (sp f32[L, 2], ep f32[L, 2], valid bool[L]).

    Prefers the native C++ detector (native/lsd.cpp — the TPU-framework
    analogue of the reference's C++ LSD backend); falls back to cv2's LSD,
    then to an empty set."""
    if prefer_native:
        out = detect_lines_native(gray, capacity, min_length_frac)
        if out is not None:
            return out
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
