"""Bisect the remaining fused-step tail (post-optimization round 3)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.vslam_tpu_jax_cache"))

from vslam_tpu.io import synthetic
from vslam_tpu.mapping import frame as frame_mod
from vslam_tpu.mapping import landmarks as lm_mod
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.solve import gn
from vslam_tpu.tracking import fused

H, W = 376, 1241
CAP = 1024
ITERS = 20

cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                          baseline_m=0.5372, rows=H, cols=W)

# REAL tracked imagery (attempt 1 succeeds) instead of random noise.
poses = synthetic.circle_trajectory(16, radius=13.0)
world = synthetic.make_world(cam, n_points=7000, seed=0, poses=poses)
f0 = synthetic.render_frame(world, 0)[:2]
f1 = synthetic.render_frame(world, 1)[:2]
chunk01 = jnp.asarray(np.stack([np.stack(f0), np.stack(f1)]), jnp.uint8)
odom = jnp.tile(jnp.eye(4), (2, 1, 1))


def time_steps(name, params, lm_cap=65536):
    step = fused.make_frame_step(params)
    state = fused.init_state(cam, params, lm_cap, 20.0)

    def run2(s):
        s, _ = step(cam, s, chunk01, jnp.int32(0), jnp.asarray(False), odom,
                    jnp.asarray(False))
        s, _ = step(cam, s, chunk01, jnp.int32(1), jnp.asarray(False), odom,
                    jnp.asarray(False))
        return s

    s = run2(state)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = run2(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / (2 * ITERS)
    print(f"{name:44s} {dt*1e3:8.3f} ms/frame  "
          f"(matches={int(s.ring[1][fused._R_NMATCH])}, "
          f"ok={int(s.ring[1][fused._R_OK])})")
    return s


base = fused.FusedParams(capacity=CAP, bin_size=16)
time_steps("full step (tracked imagery)", base)
time_steps("no recovery", base._replace(enable_recovery=False))
time_steps("no eviction", base._replace(enable_eviction=False))
time_steps("gn refine=2", base._replace(
    gn_config=gn.GNConfig(refine_iterations=2)))
time_steps("gn 8 iters 2 refine", base._replace(
    gn_config=gn.GNConfig(max_iterations=8, refine_iterations=2)))
time_steps("kf disabled (min_landmarks 9999)",
           base._replace(kf_min_landmarks=9999))
time_steps("small table 8192", base, lm_cap=8192)
time_steps("free_list 1024", base._replace(free_list_size=1024))
