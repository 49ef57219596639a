"""The fused per-keyframe mapper chain (LocalMapper._process_impl, ONE
device dispatch — the round-5 fix for the 17-fps production-path stall) must
be BIT-EQUAL to the round-4 staged chain (one dispatch per stage), including
the lax.scan'd SearchInNeighbors fan-out vs the unrolled Python loop."""

import numpy as np

import jax
import jax.numpy as jnp

from plslam_tpu.features.frame import FrameBuilder
from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.pipeline.mapping import LocalMapper
from plslam_tpu.pipeline.tracking import Tracker


def test_fused_chain_matches_staged():
    seq = SyntheticSequence(n_frames=14, height=240, width=320, seed=3)
    tracker = Tracker(seq.settings, max_kf=32, max_pts=4096)
    mapper = LocalMapper(tracker)
    builder = FrameBuilder(seq.settings)

    st_a = tracker.init_state()
    st_b = tracker.init_state()
    n_kf = 0
    for i in range(seq.n_frames):
        g, d, _ = seq.frame(i)
        frame = builder(jnp.asarray(g), jnp.asarray(d))
        st_a, out_a = tracker.step(st_a, frame)
        st_b, out_b = tracker.step(st_b, frame)
        assert bool(out_a.new_kf) == bool(out_b.new_kf)
        if bool(out_a.new_kf):
            n_kf += 1
            st_a = st_a._replace(m=mapper.process(st_a.m, int(out_a.kf_id)))
            st_b = st_b._replace(
                m=mapper.process_staged(st_b.m, int(out_b.kf_id))
            )
    assert n_kf >= 2, f"fixture produced only {n_kf} keyframes"
    la = jax.tree.map(np.asarray, st_a.m)
    lb = jax.tree.map(np.asarray, st_b.m)
    for name, a, b in zip(la._fields, la, lb):
        np.testing.assert_array_equal(a, b, err_msg=name)
