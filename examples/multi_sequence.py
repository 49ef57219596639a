#!/usr/bin/env python
"""Batched multi-sequence offline mapping (driver config 5).

Runs B independent RGB-D sequences through ONE vmapped tracking step per
frame index — the whole batch shares a single device dispatch; per-sequence
map state lives in HBM. This is the capability the reference does not have
(it runs one sequence per process; SURVEY.md §3.3).

    python examples/multi_sequence.py --batch 4 --frames 40 [--cpu]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--map", action="store_true",
                    help="run the vmapped mapper chain too (full offline "
                         "mapping: triangulation + fuse + local BA per KF)")
    ap.add_argument("--out-prefix", default="/tmp/multiseq")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from plslam_tpu.eval import ate_rmse
    from plslam_tpu.features.frame import FrameBuilder
    from plslam_tpu.io.synthetic import SyntheticSequence
    from plslam_tpu.io.trajectory import load_trajectory_tum, save_trajectory_tum
    from plslam_tpu.parallel.batch import BatchedTracker
    from plslam_tpu.pipeline.tracking import Tracker

    B = args.batch
    seqs = [
        SyntheticSequence(
            n_frames=args.frames, height=args.height, width=args.width, seed=11 * b + 1
        )
        for b in range(B)
    ]
    fb = FrameBuilder(seqs[0].settings)
    tracker = Tracker(seqs[0].settings, max_pts=8192, max_kf=64)
    bt = BatchedTracker(tracker, batch=B)
    bm = None
    if args.map:
        from plslam_tpu.parallel.batch import BatchedMapper
        from plslam_tpu.pipeline.mapping import LocalMapper

        bm = BatchedMapper(LocalMapper(tracker))
    state = bt.init_state()

    logs = [[] for _ in range(B)]  # (t, rel_pose, ref, tracked)
    t_total = 0.0
    for i in range(args.frames):
        frames = [fb(*[jnp.asarray(x) for x in s.frame(i)[:2]]) for s in seqs]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
        t0 = time.perf_counter()
        state, out = bt.step(state, batch)
        if bm is not None:
            state = state._replace(m=bm.process(state.m, out.kf_id, out.new_kf))
        jax.block_until_ready(out.Tcw)
        if i > 0:
            t_total += time.perf_counter() - t0
        rel = np.asarray(out.rel_pose, np.float64)
        refs = np.asarray(out.ref_kf)
        trk = np.asarray(out.tracked)
        for b in range(B):
            logs[b].append((seqs[b].timestamp(i), rel[b], int(refs[b]), bool(trk[b])))

    fps = (args.frames - 1) * B / t_total
    print(f"batch={B}: {fps:.1f} aggregate frames/sec ({fps / B:.1f} per sequence)")
    kf_poses = np.asarray(state.m.kf_pose, np.float64)
    for b in range(B):
        out_file = f"{args.out_prefix}_{b}.txt"
        save_trajectory_tum(
            out_file,
            [l[0] for l in logs[b]],
            [l[1] for l in logs[b]],
            [l[2] for l in logs[b]],
            kf_poses[b],
            tracked_mask=[l[3] for l in logs[b]],
        )
        rmse, n = ate_rmse(load_trajectory_tum(out_file), seqs[b].gt_trajectory())
        print(f"  seq {b}: tracked {sum(l[3] for l in logs[b])}/{args.frames}, "
              f"ATE {rmse * 100:.2f} cm -> {out_file}")


if __name__ == "__main__":
    main()
