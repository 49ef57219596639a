"""Driver config-1 e2e proof (round-4 verdict next #8): a System built
VERBATIM from configs/TUM1.yaml — point-only ORB tracking, no loop closing
(BASELINE.json configs[0]) — must (a) track a geometrically consistent
synthetic sequence rendered through that exact calibration (intrinsics AND
the freiburg1 lens distortion), (b) dead-code the line pipeline: the device
LSD kernel is never even TRACED and no map line is ever created, and (c)
instantiate no loop-closing module (relocalization stays available — in the
reference it lives inside Tracking, src/Tracking.cc ~1300)."""

from pathlib import Path

import numpy as np
import pytest

from plslam_tpu.config import load_settings
from plslam_tpu.eval import ate_rmse
from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.system import System

CFG = Path(__file__).resolve().parents[1] / "configs" / "TUM1.yaml"


@pytest.fixture(scope="module")
def config1_run():
    import dataclasses

    import plslam_tpu.ops.lsd_device as lsd_device

    settings = load_settings(CFG)
    assert settings.use_lines is False and settings.use_loop_closing is False
    # same config, test-sized image (the yaml's 640x480 takes minutes on the
    # CPU suite runner); intrinsics scale with the image, distortion is
    # dimensionless so the freiburg1 lens model is exercised as shipped
    sc = 0.5
    settings = dataclasses.replace(
        settings,
        width=320, height=240,
        fx=settings.fx * sc, fy=settings.fy * sc,
        cx=settings.cx * sc, cy=settings.cy * sc,
        depth_map_factor=1.0,  # synthetic depth is in meters already
    )
    seq = SyntheticSequence(n_frames=12, seed=3, settings=settings)

    # tripwire: the device LSD kernel must never be traced in this profile
    calls = {"n": 0}
    orig = lsd_device.detect_lines_device

    def counted(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    lsd_device.detect_lines_device = counted
    try:
        slam = System(settings, max_pts=4096, max_kf=32)
        poses = [slam.track_rgbd(*seq.frame(i)) for i in range(seq.n_frames)]
    finally:
        lsd_device.detect_lines_device = orig
    return slam, poses, seq, calls["n"]


class TestConfig1:
    def test_tracks(self, config1_run):
        slam, poses, seq, _ = config1_run
        assert all(p is not None for p in poses)
        assert slam.get_tracking_state() == "OK"
        est = [(seq.timestamp(i), np.linalg.inv(p))
               for i, p in enumerate(poses)]
        rmse, n = ate_rmse(est, seq.gt_trajectory())
        assert n == seq.n_frames
        assert rmse < 0.02, f"config-1 ATE {rmse * 100:.2f} cm"

    def test_line_pipeline_dead(self, config1_run):
        slam, _, _, lsd_calls = config1_run
        assert lsd_calls == 0, "device LSD was traced in a point-only config"
        assert slam.builder.use_lines is False
        assert int(np.asarray(slam.state.m.n_ln)) == 0
        assert not np.asarray(slam.state.m.ln_valid).any()
        assert not np.asarray(slam.state.m.kf_ln_valid).any()

    def test_no_loop_module(self, config1_run):
        from plslam_tpu.pipeline.loopclosing import LoopCloser
        from plslam_tpu.pipeline.reloc import Relocalizer

        slam, _, _, _ = config1_run
        assert slam._loop is None
        assert slam.use_loop_closing is False
        # relocalization stays available without the loop module
        assert isinstance(slam._reloc, Relocalizer)
        assert not isinstance(slam._reloc, LoopCloser)
