"""Interleaved A/B chunk-step benchmark on the real TPU.

The axon tunnel's throughput drifts minute-to-minute, so only
interleaved same-process comparisons are meaningful: variants are timed
in round-robin order (A,B,A,B,...) with a fori_loop chain and one scalar
fetch per sample; reported per-frame time is the slope between the 1-rep
and 3-rep chains, per variant, using medians over rounds.

Usage: python scripts/ab_step.py  (edit VARIANTS below in-session)
"""

import copy
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.vslam_tpu_jax_cache")
    )
    from vslam_tpu.io import synthetic
    from vslam_tpu.io.config import ParameterCollection
    from vslam_tpu.mapping import frame as frame_mod
    from vslam_tpu.ops import camera as cam_ops
    from vslam_tpu.tracking import fused
    from vslam_tpu.tracking.tracker import FusedPoseTracker

    cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                              baseline_m=0.5372, rows=376, cols=1241)
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 1024
    cfg.framepoint_generation.bin_size_pixels = 16
    cfg.parallelism.frames_per_chunk = 32
    n = 32
    poses = synthetic.circle_trajectory(n, radius=13.0)
    world = synthetic.make_world(cam, n_points=7000, seed=0, poses=poses)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(n)]
    tr = FusedPoseTracker(cam, copy.deepcopy(cfg), landmark_capacity=65536)
    (chunk_dev, k), = tr.prestage(frames)
    k_dev = jnp.int32(k)
    motion = jnp.asarray(True)
    odom = jax.device_put(np.tile(np.eye(4, dtype=np.float32), (k, 1, 1)))
    use_odom = jnp.asarray(False)
    st0 = tr.state

    def make_runner(params, fused_frontend=True, tweak=0.0):
        frame_mod._ENABLE_FUSED_FRONTEND = fused_frontend
        # Builders memoize on params; a per-variant epsilon tweak forces a
        # distinct builder so the trace-time flag takes effect per variant.
        params = params._replace(epipolar_tol=params.epipolar_tol + tweak)
        step = fused.make_chunk_step(params, None)

        @jax.jit
        def reps(state, chunk, nreps):
            def body(i, s):
                return step(cam, s, chunk, k_dev, motion, odom, use_odom)
            return jax.lax.fori_loop(0, nreps, body, state).T_world_cam[0, 3]

        np.asarray(reps(st0, chunk_dev, 1))  # compile both rep programs
        np.asarray(reps(st0, chunk_dev, 3))
        return lambda nr: np.asarray(reps(st0, chunk_dev, nr))

    base = tr.params
    VARIANTS = [
        ("baseline", dict(params=base, fused_frontend=True)),
        ("no_evict", dict(params=base._replace(enable_eviction=False),
                          fused_frontend=True)),
        ("no_recovery", dict(params=base._replace(enable_recovery=False),
                             fused_frontend=True)),
        ("gn5", dict(params=base._replace(
            gn_config=base.gn_config._replace(max_iterations=5)),
            fused_frontend=True)),
    ]
    if "--variants" in sys.argv:
        pass  # edited in-session

    runners = [(name, make_runner(**kw)) for name, kw in VARIANTS]
    ROUNDS = 7
    t1 = {name: [] for name, _ in runners}
    t3 = {name: [] for name, _ in runners}
    for _ in range(ROUNDS):
        for name, r in runners:
            t0 = time.perf_counter(); r(1); t1[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); r(3); t3[name].append(time.perf_counter() - t0)
    for name, _ in runners:
        slope = (np.median(t3[name]) - np.median(t1[name])) / 2.0
        print(f"{name}: {1e3 * slope / k:.3f} ms/frame")


if __name__ == "__main__":
    main()
