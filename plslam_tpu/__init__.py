"""plslam_tpu — TPU-native RGB-D point+line SLAM framework.

A from-scratch JAX/Pallas/XLA rebuild of the capabilities of
maxee1900/RGBD-PL-SLAM (an ORB-SLAM2 fork adding LSD/LBD line features to the
RGB-D pipeline). See SURVEY.md at the repo root for the full blueprint.

Design principles (TPU-first, not a port):
  * The map is a fixed-capacity struct-of-arrays pytree in HBM; no pointer
    graphs, no mutexes — masks and indices everywhere.
  * Per-frame tracking is a single jitted step function (scannable).
  * Feature extraction, matching, and optimization are batched device
    programs: Hamming matching rides the MXU as a ±1-bit matmul; bundle
    adjustment is a dense-blocked Schur LM under `lax.while_loop`.
  * The reference's pthread pipeline (tracking ∥ local-mapping ∥ loop-closing,
    src/System.cc ~95-110) becomes XLA-staged dispatch orchestrated by a thin
    host loop.

Public API (reference: include/System.h — System/TrackRGBD/SaveTrajectoryTUM):
    from plslam_tpu import System
    slam = System(settings_yaml, sensor="rgbd")
    Tcw = slam.track_rgbd(rgb, depth, timestamp)   # 4x4 world->cam or None
    slam.save_trajectory_tum(path)
"""

__version__ = "0.1.0"

from plslam_tpu.config import Settings, load_settings  # noqa: F401

__all__ = ["Settings", "load_settings", "System", "__version__"]


def __getattr__(name):
    # Lazy import: keep `import plslam_tpu` cheap (no jax import) for tooling.
    if name == "System":
        from plslam_tpu.system import System

        return System
    raise AttributeError(f"module 'plslam_tpu' has no attribute {name!r}")
