"""Micro-profile of fused-step sub-programs on the real TPU.

Times each device sub-program in isolation (chained iterations, one final
block) so the 5-6 ms fused frame step can be attributed to stages.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.vslam_tpu_jax_cache"))

from vslam_tpu.frontend import brief, detect, matching
from vslam_tpu.mapping import frame as frame_mod
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.solve import gn
from vslam_tpu.tracking import fused

H, W = 376, 1241
CAP = 1024
ITERS = 30

cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                          baseline_m=0.5372, rows=H, cols=W)

rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
thresh = jnp.float32(20.0)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:8.3f} ms")
    return out


# 1. detection (one image)
kp = timeit("detect_keypoints (1 img)", detect.detect_keypoints,
            img_l, thresh, 16, CAP, 20, "FAST")

# 1b. detection both images in one jit


@jax.jit
def detect2(il, ir, t):
    return (detect.detect_keypoints(il, t, 16, CAP, 20, "FAST"),
            detect.detect_keypoints(ir, t, 16, CAP, 20, "FAST"))


kl, kr = timeit("detect x2 (one jit)", detect2, img_l, img_r, thresh)

# 2. dense BRIEF planes for the pair
planes = timeit("dense_planes_pair", jax.jit(brief.dense_planes_pair),
                img_l, img_r)


# 3. gather descriptors x2
@jax.jit
def gath(planes, kl_uv, kr_uv):
    dl = brief.gather_descriptors(planes[0], (H, W), kl_uv)
    dr = brief.gather_descriptors(planes[1], (H, W), kr_uv)
    return dl, dr


dl, dr = timeit("gather_descriptors x2", gath, planes, kl.uv, kr.uv)

# 4. stereo match
m = timeit("match_stereo", matching.match_stereo,
           kl.uv, dl, kl.valid, kr.uv, dr, kr.valid,
           jnp.int32(60), jnp.float32(1.5), jnp.float32(0.0),
           jnp.float32(200.0))

# 5. full stereo front-end
fe = timeit(
    "stereo_frontend_core (full)",
    lambda *a: frame_mod.process_stereo_pair(*a),
    cam, img_l, img_r, thresh, jnp.int32(60), jnp.float32(1.5),
    jnp.float32(1.0), jnp.float32(200.0),
)
frame0 = fe[0]

# 6. track_and_align (single attempt)
weights = jnp.ones(CAP, jnp.float32)
res = timeit(
    "track_and_align (1 attempt)",
    lambda *a: frame_mod.track_and_align(*a),
    cam, frame0, frame0, jnp.eye(4), jnp.float32(50.0), jnp.int32(60),
    weights,
)

# 7. the full fused step
params = fused.FusedParams(capacity=CAP, bin_size=16)
step = fused.make_frame_step(params)
state = fused.init_state(cam, params, 65536, 20.0)
chunk = jnp.stack([jnp.stack([img_l, img_r])] * 2).astype(jnp.uint8)
odom = jnp.tile(jnp.eye(4), (2, 1, 1))


def run_step(state):
    s, _ = step(cam, state, chunk, jnp.int32(0), jnp.asarray(False), odom,
                jnp.asarray(False))
    return s


state2 = run_step(state)
jax.block_until_ready(state2)
t0 = time.perf_counter()
s = state2
for _ in range(ITERS):
    s = run_step(s)
jax.block_until_ready(s)
dt = (time.perf_counter() - t0) / ITERS
print(f"{'FULL fused frame_step':40s} {dt*1e3:8.3f} ms")

# 8. fused step without recovery
params_nr = fused.FusedParams(capacity=CAP, bin_size=16, enable_recovery=False)
step_nr = fused.make_frame_step(params_nr)
state_nr = fused.init_state(cam, params_nr, 65536, 20.0)


def run_step_nr(state):
    s, _ = step_nr(cam, state, chunk, jnp.int32(0), jnp.asarray(False), odom,
                   jnp.asarray(False))
    return s


s = run_step_nr(state_nr)
jax.block_until_ready(s)
t0 = time.perf_counter()
for _ in range(ITERS):
    s = run_step_nr(s)
jax.block_until_ready(s)
dt = (time.perf_counter() - t0) / ITERS
print(f"{'fused step (no recovery)':40s} {dt*1e3:8.3f} ms")
