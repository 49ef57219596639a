"""TUM-format trajectory writing (byte-compatible with TUM eval tooling).

Mirrors System::SaveTrajectoryTUM (src/System.cc ~450): per-frame pose is
stored as T_rel = Tcw * Twr(refKF) at track time and composed with the
(possibly loop-corrected) reference keyframe pose at save time — this replay
trick is how loop/GBA corrections retroactively fix the full trajectory
(SURVEY.md §4.5). Output lines: `timestamp tx ty tz qx qy qz qw` of Twc.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _pose_line(t: float, Twc: np.ndarray) -> str:
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(Twc[:3, :3]).as_quat()  # xyzw
    tx, ty, tz = Twc[:3, 3]
    return (
        f"{t:.6f} {tx:.7f} {ty:.7f} {tz:.7f} "
        f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}"
    )


def save_trajectory_tum(
    path: str | Path,
    timestamps,
    rel_poses,
    ref_kf_ids,
    kf_poses,
    tracked_mask=None,
):
    """Write the frame trajectory.

    timestamps: [N] float; rel_poses: [N, 4, 4] Tcr (current <- ref KF);
    ref_kf_ids: [N] int; kf_poses: [K, 4, 4] final (corrected) KF Tcw;
    tracked_mask: [N] bool (untracked frames are skipped, like the
    reference's empty-pose check)."""
    lines = []
    kf_poses = np.asarray(kf_poses, np.float64)
    for i, (t, Tcr, ref) in enumerate(zip(timestamps, rel_poses, ref_kf_ids)):
        if tracked_mask is not None and not tracked_mask[i]:
            continue
        Tcw = np.asarray(Tcr, np.float64) @ kf_poses[int(ref)]
        Twc = np.linalg.inv(Tcw)
        lines.append(_pose_line(float(t), Twc))
    Path(path).write_text("\n".join(lines) + "\n")


def save_keyframe_trajectory_tum(path: str | Path, kf_timestamps, kf_poses, kf_valid):
    """System::SaveKeyFrameTrajectoryTUM (~500): Twc of each keyframe."""
    lines = []
    for t, Tcw, ok in zip(kf_timestamps, np.asarray(kf_poses, np.float64), kf_valid):
        if not ok:
            continue
        lines.append(_pose_line(float(t), np.linalg.inv(Tcw)))
    Path(path).write_text("\n".join(lines) + "\n")


def load_trajectory_tum(path: str | Path):
    """-> [(t, Twc)] — for tests/eval round-trips."""
    from plslam_tpu.io.tum import load_groundtruth

    return load_groundtruth(path)
