"""Profile the fused KF-chain program's device cost on the real TPU,
stage by stage, to find where the ~150 ms goes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/benchmarks/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from plslam_tpu.io.synthetic import SyntheticSequence
from plslam_tpu.system import System

print("devices:", jax.devices())
N = 60
seq = SyntheticSequence(n_frames=N, height=480, width=640, seed=0)
frames = [seq.frame(i) for i in range(N)]
slam = System(seq.settings, pipeline_depth=0)

# run until a few KFs exist
for g, d, t in frames[:40]:
    slam.track_rgbd(g, d, t)
slam._flush_pending()
m = slam.state.m
print("n kf:", int(np.asarray(m.kf_valid).sum()), "n pt:", int(np.asarray(m.pt_valid).sum()))

mapper = slam._mapper
tr = slam.tracker
state = slam.state
k = jnp.int32(int(np.asarray(m.kf_valid).argmax()))

def timeit(name, fn, *a, n=6):
    outs = fn(*a)
    jax.block_until_ready(outs)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        outs = fn(*a)
        jax.block_until_ready(outs)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:28s} median {np.median(ts):8.2f} ms  min {min(ts):8.2f}")
    return outs

# stage-by-stage (jitted separately; includes ~dispatch overhead each)
timeit("cull", jax.jit(mapper._cull_impl), m, k)
timeit("triangulate", jax.jit(mapper._triangulate_impl), m, k)
timeit("triangulate_lines", jax.jit(mapper._triangulate_lines_impl), m, k)
timeit("fuse dir1 (all pts)", jax.jit(mapper._fuse_impl), m, k, m.pt_valid)
timeit("fuse_lines", jax.jit(mapper._fuse_lines_impl), m, k)

def fuse_dir2(m, k):
    tids, tflags = mapper._targets_impl(m, k)
    row = m.kf_lm_idx[k]
    cand_ids = jnp.where(m.kf_feat_valid[k] & (row >= 0), row, -1)
    def body(mm, tf):
        tid, tflag = tf
        ids = jnp.where(tflag, cand_ids, -1)
        return mapper._fuse_subset_impl(mm, tid, ids), None
    m, _ = jax.lax.scan(body, m, (tids, tflags))
    return m
timeit("fuse dir2 (12-scan)", jax.jit(fuse_dir2), m, k)
if mapper._ba is not None:
    ba = mapper._ba
    timeit("local BA", jax.jit(lambda m, k: ba._run(m, k, ba.iters1, ba.iters2, True)), m, k)
timeit("refresh", jax.jit(mapper._refresh_impl), m, k)
timeit("refresh_lines", jax.jit(mapper._refresh_lines_impl), m, k)
timeit("kf_cull", jax.jit(mapper._kf_cull_impl), m, k)
timeit("ensure_free_slot", jax.jit(mapper._ensure_free_slot_impl), m, k)
timeit("mapper _process_impl", jax.jit(mapper._process_impl), m, k)
timeit("compute_local_set", jax.jit(tr._compute_local_set), m, jnp.int32(0))

loop = slam._loop
if loop is not None:
    kb = slam._reloc.kf_bow
    gm, gc = loop._g_mask, loop._g_consist
    timeit("detect gate", jax.jit(loop._detect_gate_impl), kb, m, k, gm, gc)

# full chain program as System dispatches it
def chain_probe():
    slam2 = System(seq.settings, pipeline_depth=0)
    for g, d, t in frames[:40]:
        slam2.track_rgbd(g, d, t)
    slam2._flush_pending()
    return slam2
slam2 = chain_probe()
kf_id = int(np.asarray(slam2.state.m.kf_valid).argmax())
t0 = time.perf_counter()
slam2._dispatch_kf_chain(kf_id)
print("chain dispatch:", round((time.perf_counter() - t0) * 1e3, 2), "ms")
t0 = time.perf_counter()
slam2._process_chain_results(block=True)
jax.block_until_ready(slam2.state.m.kf_valid)
print("chain block+read:", round((time.perf_counter() - t0) * 1e3, 2), "ms")
