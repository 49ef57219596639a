"""Multi-device mesh tests: BatchedTracker over the 8-virtual-CPU-device mesh.

Covers SURVEY.md §3.3 "Distributed comm / mesh sharding" (the reference has no
distribution — pthreads over shared memory, src/System.cc thread spawn ~95-110
— so this is the TPU-native scale-out story: seq=data-parallel over
sequences, lm=model-parallel over the landmark axis). conftest.py provisions
8 virtual CPU devices; these tests must never be skipped on a CPU runner.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam_tpu.features.frame import FrameBuilder
from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.parallel.batch import BatchedTracker, make_mesh
from plslam_tpu.pipeline.tracking import Tracker


@pytest.fixture(scope="module")
def tiny_setup():
    seq = SyntheticSequence(n_frames=3, height=192, width=256)
    settings = dataclasses.replace(seq.settings, n_features=120)
    builder = FrameBuilder(settings, capacity=128, line_capacity=16)
    tracker = Tracker(
        settings, max_kf=8, max_pts=512, max_feat=128, max_lines=16, max_maplines=64
    )
    frames = [builder(jnp.asarray(g), jnp.asarray(d)) for g, d, _ in
              (seq.frame(i) for i in range(3))]
    return tracker, frames


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["seq"] * mesh.shape["lm"] == 8
    assert mesh.shape["seq"] >= 2


def _broadcast(frame, batch, mesh=None):
    frames = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), frame
    )
    if mesh is not None:
        frames = jax.device_put(
            frames,
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("seq")),
        )
    return frames


def test_batched_tracker_sharded_two_steps(tiny_setup):
    """Full batched tracking step jitted over the (seq, lm) mesh: init +
    2 frames, all sequences stay tracked, map state stays sharded."""
    tracker, frames = tiny_setup
    mesh = make_mesh(8)
    bt = BatchedTracker(tracker, batch=mesh.shape["seq"] * 2, mesh=mesh)
    state = bt.init_state()
    for i in range(2):
        state, out = bt.step(state, _broadcast(frames[i], bt.batch, mesh))
    jax.block_until_ready(out)
    assert bool(np.asarray(out.tracked).all())
    # landmark (pt_) arrays really live sharded over the mesh
    sh = state.m.pt_pos.sharding
    assert isinstance(sh, jax.sharding.NamedSharding)
    assert sh.spec == jax.sharding.PartitionSpec("seq", "lm")
    assert len(state.m.pt_pos.devices()) == 8


def test_batched_mapper_matches_unbatched():
    """Config 5 is batched OFFLINE MAPPING: one vmapped-chain call
    (triangulate + fuse + local BA + refresh + culling) over two DISTINCT
    map states must equal the solo mapper run on each row.

    The comparison is open-loop on purpose: the two maps are produced by
    ordinary solo tracking first, then the vmapped chain and the solo chain
    process the SAME inputs once. (A closed-loop 8-frame comparison is
    chaotic — ~1e-6 vmap-vs-solo fusion drift flips pose-opt inlier gates
    and the runs legitimately diverge; see the round-3 session log.)"""
    from plslam_tpu.parallel.batch import BatchedMapper
    from plslam_tpu.pipeline.mapping import LocalMapper

    n_frames = 5
    seqs = [SyntheticSequence(n_frames=n_frames, height=192, width=256, seed=s)
            for s in (3, 7)]
    settings = dataclasses.replace(seqs[0].settings, n_features=120)
    builder = FrameBuilder(settings, capacity=128, line_capacity=16)
    tracker = Tracker(
        settings, max_kf=8, max_pts=512, max_feat=128, max_lines=16,
        max_maplines=64,
    )
    mapper = LocalMapper(tracker)
    bm = BatchedMapper(mapper)

    # build two distinct pre-chain map states by solo tracking; snapshot the
    # map right before each chain invocation and keep the last snapshot
    step = jax.jit(tracker._step)
    pend = []  # (map_before_chain, kf_id)
    for seq in seqs:
        st = tracker.init_state()
        snap = None
        for i in range(n_frames):
            g, d, _ = seq.frame(i)
            st, out = step(st, builder(jnp.asarray(g), jnp.asarray(d)))
            if bool(out.new_kf):
                snap = (st.m, int(out.kf_id))
                st = st._replace(m=mapper.process(st.m, int(out.kf_id)))
        assert snap is not None, "fixture produced no keyframe"
        pend.append(snap)

    want = [jax.tree.map(np.asarray, mapper.process(m, k)) for m, k in pend]

    bmaps = jax.tree.map(lambda *xs: jnp.stack(xs), *[m for m, _ in pend])
    got = bm.process(
        bmaps,
        jnp.asarray([k for _, k in pend], jnp.int32),
        jnp.asarray([True, True]),
    )
    for b, solo in enumerate(want):
        got_b = jax.tree.leaves(jax.tree.map(lambda x: np.asarray(x[b]), got))
        for g_, w_ in zip(got_b, jax.tree.leaves(solo)):
            # vmapped local BA fuses in a different order than the solo
            # program — float32 drift up to ~5e-4 on metre-scale positions
            np.testing.assert_allclose(g_, w_, rtol=1e-3, atol=2e-3)


def test_batched_mapper_masked_is_identity():
    """do=False must return the input map bit-identically (the masked
    no-op is what lets sequences insert keyframes at different frames)."""
    from plslam_tpu.parallel.batch import BatchedMapper
    from plslam_tpu.pipeline.mapping import LocalMapper

    seq = SyntheticSequence(n_frames=2, height=192, width=256)
    settings = dataclasses.replace(seq.settings, n_features=120)
    builder = FrameBuilder(settings, capacity=128, line_capacity=16)
    tracker = Tracker(
        settings, max_kf=8, max_pts=512, max_feat=128, max_lines=16,
        max_maplines=64,
    )
    bm = BatchedMapper(LocalMapper(tracker))
    bt = BatchedTracker(tracker, batch=2)
    bstate = bt.init_state()
    g, d, _ = seq.frame(0)
    frame = builder(jnp.asarray(g), jnp.asarray(d))
    batch = jax.tree.map(lambda x: jnp.stack([x, x]), frame)
    bstate, bout = bt.step(bstate, batch)
    m2 = bm.process(
        bstate.m, bout.kf_id, jnp.asarray([False, False])
    )
    for a, b in zip(jax.tree.leaves(m2), jax.tree.leaves(bstate.m)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loop_detect_gate_sharded(tiny_setup):
    """Loop detection under the (seq, lm) mesh (round-4 verdict Missing #4):
    per-sequence BoW databases sharded over `seq`, the FULL DetectLoop gate
    chain (TF-IDF scoring, min-score, temporal + shared-word gates, group
    3-consistency) as ONE vmapped sharded program. A self-revisit query on a
    tiny map must come back rejected (temporal gate) with finite scores —
    and a perfect self-score on the diagonal proves the scoring path ran."""
    from plslam_tpu.parallel.batch import BatchedLoopDetector
    from plslam_tpu.pipeline.loopclosing import LoopCloser

    tracker, frames = tiny_setup
    mesh = make_mesh(8)
    bt = BatchedTracker(tracker, batch=mesh.shape["seq"] * 2, mesh=mesh)
    state = bt.init_state()
    state, out = bt.step(state, _broadcast(frames[0], bt.batch, mesh))
    assert bool(np.asarray(out.new_kf).all())

    loop = LoopCloser(tracker)
    bld = BatchedLoopDetector(loop, mesh=mesh)
    kf_bow = bld.init_bow(bt.batch)
    assert isinstance(kf_bow.sharding, jax.sharding.NamedSharding)
    g_mask, g_consist = bld.init_groups(bt.batch)
    kf0 = jnp.zeros(bt.batch, jnp.int32)
    kf_bow = bld.observe(kf_bow, state.m, kf0)
    has_any, enough, scores, g_mask, g_consist = bld.detect_gate(
        kf_bow, state.m, kf0, g_mask, g_consist
    )
    s = np.asarray(scores)
    assert np.isfinite(s).all()
    # the query IS keyframe 0: its self-similarity must be ~1 (scoring ran)
    np.testing.assert_allclose(s[:, 0], 1.0, atol=1e-5)
    # ...and the temporal gate must reject the self-revisit as a candidate
    assert not np.asarray(has_any).any()


def test_batched_matches_unbatched(tiny_setup):
    """Sharded batched run computes the same poses as the plain single-seq
    tracker (broadcast inputs -> every row identical to the unbatched run)."""
    tracker, frames = tiny_setup
    mesh = make_mesh(8)
    bt = BatchedTracker(tracker, batch=mesh.shape["seq"], mesh=mesh)
    bstate = bt.init_state()
    sstate = tracker.init_state()
    step = jax.jit(tracker._step)
    for i in range(2):
        bstate, bout = bt.step(bstate, _broadcast(frames[i], bt.batch, mesh))
        sstate, sout = step(sstate, frames[i])
    bpose = np.asarray(bout.Tcw)
    spose = np.asarray(sout.Tcw)
    np.testing.assert_allclose(bpose[0], spose, rtol=0, atol=1e-4)
    # all batch rows identical (same input)
    np.testing.assert_allclose(bpose, np.broadcast_to(spose, bpose.shape),
                               rtol=0, atol=1e-4)
