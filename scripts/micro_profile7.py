"""Bisect the fused-step tail: which stage costs the ~7ms?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.vslam_tpu_jax_cache"))

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
rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
chunk = jnp.stack([jnp.stack([img_l, img_r])] * 2).astype(jnp.uint8)
odom = jnp.tile(jnp.eye(4), (2, 1, 1))


def time_step(name, params, lm_cap=65536):
    step = fused.make_frame_step(params)
    state = fused.init_state(cam, params, lm_cap, 20.0)

    def run(s):
        s2, _ = step(cam, s, chunk, jnp.int32(0), jnp.asarray(False), odom,
                     jnp.asarray(False))
        return s2

    s = run(state)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s = run(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:8.3f} ms")


base = fused.FusedParams(capacity=CAP, bin_size=16)
time_step("full step (base)", base)
time_step("no recovery", base._replace(enable_recovery=False))
time_step("no eviction", base._replace(enable_eviction=False))
time_step("small table (4096)", base, lm_cap=4096)
time_step("gn 8 iters 2 refine",
          base._replace(gn_config=gn.GNConfig(max_iterations=8,
                                              refine_iterations=2)))
time_step("kf ring 4 / kfmax 256",
          base._replace(kf_ring_size=4, kf_max_landmarks=256))
time_step("free_list 1024", base._replace(free_list_size=1024))
time_step("ring 16", base._replace(ring_size=16))
