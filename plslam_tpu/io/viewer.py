"""Headless visualization (the reference's L6: FrameDrawer/MapDrawer/Viewer).

The reference's Pangolin viewer is interactive OpenGL (src/Viewer.cc,
FrameDrawer.cc, MapDrawer.cc); this environment is headless, so the same
observability is provided as image dumps:

  * draw_frame: current frame with tracked keypoints (green = matched to a
    landmark, blue = unmatched), keylines, and the state banner — the
    FrameDrawer::DrawFrame equivalent.
  * draw_map: top-down (x-z) scatter of map points/lines, keyframe frusta
    and the current camera — the MapDrawer equivalent.

Both return uint8 images; callers write them with cv2.imwrite or stash them
in logs. `System.dump_debug_images(dir)` wires them up.
"""

from __future__ import annotations

import numpy as np


def draw_frame(gray: np.ndarray, state, tracked_mask=None) -> np.ndarray:
    """gray f32[H, W] + TrackState -> BGR u8[H, W, 3] overlay."""
    import cv2

    img = cv2.cvtColor(np.clip(gray, 0, 255).astype(np.uint8), cv2.COLOR_GRAY2BGR)
    uv = np.asarray(state.last.uvr[:, :2])
    valid = np.asarray(state.last.valid)
    lm = np.asarray(state.last.lm_idx)
    for i in np.where(valid)[0]:
        x, y = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if 0 <= x < img.shape[1] and 0 <= y < img.shape[0]:
            color = (0, 200, 0) if lm[i] >= 0 else (200, 120, 0)
            cv2.circle(img, (x, y), 2, color, -1)
    states = {0: "NOT INITIALIZED", 1: "OK", 2: "LOST"}
    n_tracked = int((lm >= 0).sum())
    text = f"{states.get(int(state.status), '?')}  matches: {n_tracked}"
    cv2.putText(img, text, (10, img.shape[0] - 12), cv2.FONT_HERSHEY_PLAIN, 1.2,
                (255, 255, 255), 1, cv2.LINE_AA)
    return img


def draw_map(state, size: int = 640) -> np.ndarray:
    """Top-down x-z map view -> BGR u8[size, size, 3]."""
    import cv2

    img = np.full((size, size, 3), 30, np.uint8)
    m = state.m
    pts = np.asarray(m.pt_pos)[np.asarray(m.pt_valid)]
    kf_pose = np.asarray(m.kf_pose)
    kf_valid = np.asarray(m.kf_valid)
    centers = []
    for i in np.where(kf_valid)[0]:
        Twc = np.linalg.inv(kf_pose[i])
        centers.append(Twc[:3, 3])
    centers = np.asarray(centers) if centers else np.zeros((0, 3))
    all_xz = np.concatenate([pts[:, [0, 2]], centers[:, [0, 2]]]) if len(pts) else centers[:, [0, 2]]
    if len(all_xz) == 0:
        return img
    lo, hi = all_xz.min(0) - 0.5, all_xz.max(0) + 0.5
    scale = (size - 40) / max(float((hi - lo).max()), 1e-6)

    def to_px(xz):
        p = (xz - lo) * scale + 20
        return int(p[0]), size - int(p[1])

    for p in pts:
        cv2.circle(img, to_px(p[[0, 2]]), 1, (140, 140, 140), -1)
    ln_v = np.asarray(m.ln_valid)
    sw, ew = np.asarray(m.ln_sw)[ln_v], np.asarray(m.ln_ew)[ln_v]
    for a, b in zip(sw, ew):
        cv2.line(img, to_px(a[[0, 2]]), to_px(b[[0, 2]]), (60, 60, 200), 1)
    for c in centers:
        cv2.circle(img, to_px(c[[0, 2]]), 4, (0, 200, 255), 1)
    Twc = np.linalg.inv(np.asarray(state.last.Tcw))
    cv2.circle(img, to_px(Twc[[0, 2], 3]), 5, (0, 255, 0), -1)
    return img
