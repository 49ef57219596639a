"""Real TUM RGB-D sequence ATE test — skip-gated on dataset presence.

The north-star acceptance metric (SURVEY.md §5.2) is ATE RMSE within 5% of
the C++ reference on TUM sequences. No network access exists in the build
environment, so this test skips cleanly offline; the moment
`tests/data/fetch_tum.sh` has run (it downloads fr1_xyz and writes
associations), this measures the real number.

Published reference numbers for context (ORB-SLAM2 paper, Table — RGB-D on
fr1_xyz: ~0.010 m ATE RMSE; PL fork comparable): the assert below is a
deliberately loose 0.05 m sanity gate so the test is a tripwire for gross
regressions, with the exact number logged for the 5% comparison.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"
SEQ = DATA / "rgbd_dataset_freiburg1_xyz"

pytestmark = pytest.mark.skipif(
    not (SEQ / "associations.txt").exists(),
    reason="TUM fr1_xyz not fetched (run tests/data/fetch_tum.sh)",
)


@pytest.fixture(scope="module")
def fr1_xyz_run():
    from plslam_tpu.config import load_settings
    from plslam_tpu.io.tum import TumSequence, load_groundtruth
    from plslam_tpu.system import System

    settings = load_settings(
        str(Path(__file__).parent.parent / "configs" / "TUM1.yaml")
    )
    seq = TumSequence(SEQ, SEQ / "associations.txt", settings.depth_map_factor)
    gt = load_groundtruth(SEQ / "groundtruth.txt")
    slam = System(settings)
    traj = []
    n = min(seq.n_frames, 300)
    for i in range(n):
        gray, depth, t = seq.frame(i)
        Tcw = slam.track_rgbd(gray, depth, t)
        if Tcw is not None:
            traj.append((t, np.linalg.inv(np.asarray(Tcw))))
    return slam, traj, gt, n


def test_tracks_majority_of_frames(fr1_xyz_run):
    slam, traj, gt, n = fr1_xyz_run
    assert len(traj) > 0.9 * n, f"tracked {len(traj)}/{n}"


def test_ate_rmse(fr1_xyz_run):
    from plslam_tpu.eval import ate_rmse

    _, traj, gt, _ = fr1_xyz_run
    rmse, n_pairs = ate_rmse(traj, gt)
    print(f"fr1_xyz ATE RMSE: {rmse:.4f} m over {n_pairs} pairs (reference ~0.010 m)")
    assert rmse < 0.05, f"ATE {rmse:.3f} m"
