#!/usr/bin/env python
"""Profile the per-frame program on the TPU: state-threaded loop under
jax.profiler, then aggregate device-trace "X" events by op name.

Usage: python tools/profile_frame.py [--top 40] [--no-lines]
"""

from __future__ import annotations

import argparse
import functools
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-lines", action="store_true")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--outdir", default="/tmp/plslam_trace")
    ap.add_argument("--hlo", action="store_true",
                    help="map top fusion names to source via compiled HLO")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plslam_tpu.features.frame import FrameBuilder
    from plslam_tpu.io.synthetic import SyntheticSequence
    from plslam_tpu.pipeline.tracking import Tracker

    seq = SyntheticSequence(n_frames=args.frames, height=480, width=640, seed=0)
    settings = seq.settings
    if args.no_lines:
        settings = settings.__class__(**{**settings.__dict__, "use_lines": False})
    builder = FrameBuilder(settings)
    tracker = Tracker(settings)
    zl = builder.empty_lines()

    # donate the state carry: the masked in-step KF/landmark scatters then
    # update HBM in place instead of copying every touched map array
    @functools.partial(jax.jit, donate_argnums=0)
    def one(state, gray, depth):
        frame = builder._build(gray, depth, *zl)
        state, out = tracker._step(state, frame)
        return state, (out.tracked, out.n_inliers)

    grays, depths = [], []
    for i in range(args.frames):
        g, d, _ = seq.frame(i)
        grays.append(jnp.asarray(g))
        depths.append(jnp.asarray(d))

    # warmup/compile
    state = tracker.init_state()
    t0 = time.perf_counter()
    for i in range(args.frames):
        state, o = one(state, grays[i], depths[i])
    jax.block_until_ready(state)
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    os.system(f"rm -rf {args.outdir}")
    state = tracker.init_state()
    jax.profiler.start_trace(args.outdir)
    t0 = time.perf_counter()
    for i in range(args.frames):
        state, o = one(state, grays[i], depths[i])
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"{args.frames} frames in {dt:.3f}s -> {args.frames / dt:.1f} fps",
          file=sys.stderr)

    files = glob.glob(f"{args.outdir}/plugins/profile/*/*trace.json.gz")
    if not files:
        print("no trace file found", file=sys.stderr)
        sys.exit(1)
    with gzip.open(files[0], "rt") as fh:
        trace = json.load(fh)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            # only device lanes: their pids have "/device:" in process name?
            # keep everything; host ops are distinguishable by name
            agg[ev["name"]] += ev["dur"]
            cnt[ev["name"]] += 1
    total = sum(agg.values())
    top = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"{'us total':>12} {'us/frame':>9} {'n':>6}  name")
    for name, us in top:
        print(f"{us:12.0f} {us / args.frames:9.1f} {cnt[name]:6d}  {name[:110]}")
    print(f"sum of events: {total / 1e3:.1f} ms", file=sys.stderr)

    if args.hlo:
        # map fusion names -> source lines via compiled-HLO metadata
        import re

        txt = (
            jax.jit(one)
            .lower(tracker.init_state(), grays[0], depths[0])
            .compile()
            .as_text()
        )
        with open("/tmp/plslam_hlo.txt", "w") as fh:
            fh.write(txt)  # full text for manual attribution
        want = {re.split(r"\.", n)[0] + "." + n.split(".")[-1]: n
                for n, _ in top if re.match(r"^[a-z_-]+\.\d+$", n)}
        print("\n--- HLO attribution ---")
        for line in txt.splitlines():
            m = re.search(r"%?([a-z0-9_.-]+\.\d+) = ", line)
            if not m or m.group(1) not in want:
                continue
            meta = re.search(r'metadata=\{([^}]*)\}', line)
            print(f"{m.group(1)}: {meta.group(1)[:220] if meta else line[:220]}")


if __name__ == "__main__":
    main()
