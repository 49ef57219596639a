"""Long-run map-growth soak: slot recycling must keep tracking alive.

SURVEY.md §6 long-context row: the reference handles unbounded growth with
keyframe/landmark culling over a heap; the TPU rebuild uses fixed-capacity
arrays with FREE-LIST slot reuse. At deliberately tiny capacities a long
sequence must (a) keep tracking, (b) keep counters equal to live counts
(no monotonic exhaustion), and (c) actually recycle keyframe slots.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.features.frame import FrameBuilder
from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.pipeline.mapping import LocalMapper
from plslam_tpu.pipeline.tracking import Tracker


def test_soak_small_caps_slot_reuse():
    seq = SyntheticSequence(n_frames=120, height=192, width=256)
    settings = dataclasses.replace(seq.settings, n_features=120)
    builder = FrameBuilder(settings, capacity=128, line_capacity=16)
    tracker = Tracker(
        settings, max_kf=6, max_pts=600, max_feat=128, max_lines=16, max_maplines=32
    )
    mapper = LocalMapper(tracker)
    state = tracker.init_state()
    step = jax.jit(tracker._step)
    n_tracked = 0
    n_kf_created = 0
    kf_slots_seen = set()
    pt_counts = []
    for i in range(120):
        g, d, _ = seq.frame(i)
        state, out = step(state, builder(jnp.asarray(g), jnp.asarray(d)))
        n_tracked += int(bool(out.tracked))
        if bool(out.new_kf):
            n_kf_created += 1
            kf_slots_seen.add(int(out.kf_id))
            state = state._replace(m=mapper.process(state.m, int(out.kf_id)))
        pt_counts.append(int(np.asarray(state.m.pt_valid).sum()))
    m = state.m
    # (a) tracking survives the whole run at tiny caps
    assert n_tracked >= 118, n_tracked
    # (b) counters are live counts, consistent with the masks
    assert int(m.n_kf) == int(np.asarray(m.kf_valid).sum())
    assert int(m.n_pt) == int(np.asarray(m.pt_valid).sum())
    # landmark population stays bounded and healthy (no collapse, no freeze)
    assert 100 <= pt_counts[-1] <= 600
    # (c) if more keyframes were created than capacity, slots were recycled
    assert n_kf_created >= 5, n_kf_created
    assert int(np.asarray(m.kf_valid).sum()) <= 6
