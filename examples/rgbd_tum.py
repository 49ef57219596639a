#!/usr/bin/env python
"""RGB-D SLAM example CLI — the equivalent of Examples/RGB-D/rgbd_tum.cc.

Usage (TUM data):
    python examples/rgbd_tum.py --settings configs/TUM1.yaml \
        --sequence /data/rgbd_dataset_freiburg1_xyz --assoc fr1_xyz.txt \
        --out CameraTrajectory.txt

Usage (offline, no dataset):
    python examples/rgbd_tum.py --synthetic --frames 60 --out /tmp/traj.txt

Prints the reference CLI's median/mean per-frame track-time report
(Examples/RGB-D/rgbd_tum.cc §main tail) plus ATE RMSE when ground truth is
available.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", default=None, help="TUM*.yaml settings file")
    ap.add_argument("--sequence", default=None, help="TUM sequence directory")
    ap.add_argument("--assoc", default=None, help="association file")
    ap.add_argument("--synthetic", action="store_true", help="use the synthetic sequence")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--low-texture", action="store_true")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--kf-out", default=None)
    ap.add_argument("--cpu", action="store_true", help="force JAX CPU")
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument(
        "--pipeline", type=int, default=0, metavar="K",
        help="frames kept in flight before host bookkeeping runs (hides the "
             "device->host telemetry round trip on tunnel-attached TPUs; "
             "0 = synchronous)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from plslam_tpu import System
    from plslam_tpu.eval import ate_rmse

    if args.synthetic:
        from plslam_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(n_frames=args.frames, low_texture=args.low_texture)
        settings = seq.settings
        gt = seq.gt_trajectory()
    else:
        if not (args.settings and args.sequence and args.assoc):
            ap.error("--settings/--sequence/--assoc required without --synthetic")
        from plslam_tpu.config import load_settings
        from plslam_tpu.io.tum import TumSequence, load_groundtruth

        settings = load_settings(args.settings)
        seq = TumSequence(args.sequence, args.assoc, settings.depth_map_factor)
        gt_file = Path(args.sequence) / "groundtruth.txt"
        gt = load_groundtruth(gt_file) if gt_file.exists() else None

    slam = System(
        settings, use_local_mapping=not args.no_ba,
        pipeline_depth=args.pipeline,
    )
    times = []
    kf_frame = []  # did this frame insert a keyframe (mapper chain ran)?
    for i in range(seq.n_frames):
        gray, depth, t = seq.frame(i)
        t0 = time.perf_counter()
        Tcw = slam.track_rgbd(gray, depth, t)
        times.append(time.perf_counter() - t0)
        kf_frame.append(slam.last_frame_was_kf)
        if i % 20 == 0:
            print(
                f"frame {i:4d}: {slam.get_tracking_state():>6s} "
                f"kf={slam.n_keyframes} pts={slam.n_map_points}"
            )

    slam.shutdown()
    n_tracked = sum(slam.tracked_flags)
    slam.save_trajectory_tum(args.out)
    if args.kf_out:
        slam.save_keyframe_trajectory_tum(args.kf_out)

    times_ms = np.sort(np.array(times[2:])) * 1e3  # drop compile frames
    print("-------")
    print(f"tracked {n_tracked}/{seq.n_frames} frames")
    print(f"median tracking time: {np.median(times_ms):.2f} ms")
    print(f"mean tracking time:   {times_ms.mean():.2f} ms")
    # keyframe-vs-ordinary latency split: measures how well the async
    # mapper dispatch keeps keyframe frames from stalling the loop
    t_arr = np.array(times[2:]) * 1e3
    kf_arr = np.array(kf_frame[2:], bool)
    if kf_arr.any() and (~kf_arr).any():
        def pct(x, q):
            return float(np.percentile(x, q))
        print(
            f"latency p50/p99 non-KF: {pct(t_arr[~kf_arr], 50):.2f}/"
            f"{pct(t_arr[~kf_arr], 99):.2f} ms | KF frames: "
            f"{pct(t_arr[kf_arr], 50):.2f}/{pct(t_arr[kf_arr], 99):.2f} ms "
            f"({int(kf_arr.sum())} KFs)"
        )
    if gt is not None:
        from plslam_tpu.io.trajectory import load_trajectory_tum

        est = load_trajectory_tum(args.out)
        rmse, n = ate_rmse(est, gt)
        print(f"ATE RMSE: {rmse * 100:.2f} cm over {n} associated frames")


if __name__ == "__main__":
    main()
