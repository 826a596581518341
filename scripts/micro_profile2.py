"""Ablation timing: incremental stages of the stereo front-end + GN internals."""

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
from vslam_tpu.mapping import landmarks as lm_mod
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.solve import aligners, gn

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
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return out


def fe_stage(n):
    @jax.jit
    def f(img_l, img_r, t):
        kl = detect.detect_keypoints(img_l, t, 16, CAP, 20, "FAST")
        kr = detect.detect_keypoints(img_r, t, 16, CAP, 20, "FAST")
        if n == 0:
            return kl, kr
        planes = brief.dense_planes_pair(img_l, img_r)
        dl = brief.gather_descriptors(planes[0], (H, W), kl.uv)
        dr = brief.gather_descriptors(planes[1], (H, W), kr.uv)
        if n == 1:
            return dl, dr
        m = matching.match_stereo(kl.uv, dl, kl.valid, kr.uv, dr, kr.valid,
                                  jnp.int32(60), jnp.float32(1.5),
                                  jnp.float32(0.0), jnp.float32(200.0))
        if n == 2:
            return m
        uv_l = kl.uv
        uv_r = kr.uv[m.right_idx]
        disp = uv_l[:, 0] - uv_r[:, 0]
        reliable = disp >= 1.0
        p_cam, _ = cam_ops.triangulate_disparity(cam, uv_l, uv_r, 1.0)
        p_cam = jnp.where(reliable[:, None], p_cam,
                          cam_ops.back_project(cam, uv_l,
                                               jnp.full_like(disp, 100.0)))
        valid = m.valid & kl.valid & (p_cam[:, 2] > 0)
        if n == 3:
            return p_cam, valid
        uv4 = jnp.concatenate([uv_l, uv_r], axis=1)
        out = frame_mod._compact(valid, uv4, dl, p_cam, valid, reliable)
        return out
    return f


timeit("fe: detect x2", fe_stage(0), img_l, img_r, thresh)
timeit("fe: + planes+gather", fe_stage(1), img_l, img_r, thresh)
timeit("fe: + match_stereo", fe_stage(2), img_l, img_r, thresh)
timeit("fe: + triangulate", fe_stage(3), img_l, img_r, thresh)
timeit("fe: + compact (full)", fe_stage(4), img_l, img_r, thresh)

# argsort alone
mask = jnp.asarray(rng.random(CAP) > 0.5)
timeit("argsort(1024 bool)", jax.jit(lambda m: jnp.argsort(~m, stable=True)),
       mask)

# GN iteration count + cost: run stereo_uv_align with varying iterations
fe = frame_mod.process_stereo_pair(cam, img_l, img_r, thresh, jnp.int32(60),
                                   jnp.float32(1.5), jnp.float32(1.0),
                                   jnp.float32(200.0))
frame0 = fe[0]
weights = jnp.ones(CAP, jnp.float32)

for mi, ri in ((100, 10), (20, 4), (8, 2), (1, 0)):
    cfgi = gn.GNConfig(max_iterations=mi, refine_iterations=ri)
    data = aligners.StereoUVData(p_prev=frame0.p_cam, meas=frame0.uv4,
                                 weight=weights)
    f = jax.jit(lambda d, m: aligners.stereo_uv_align(cam, d, m, jnp.eye(4),
                                                      cfgi))
    r = timeit(f"stereo_uv_align iters={mi},{ri}", f, data, frame0.valid)

# how many iterations does it actually take?
cfg_probe = gn.GNConfig()
data = aligners.StereoUVData(p_prev=frame0.p_cam, meas=frame0.uv4,
                             weight=weights)
res = aligners.stereo_uv_align(cam, data, frame0.valid, jnp.eye(4), cfg_probe)
print("actual GN iterations (identity fit):", int(res.num_iterations))

# landmark table update cost
table = lm_mod.empty_table(65536)
slot = jnp.where(frame0.valid, jnp.arange(CAP, dtype=jnp.int32), -1)
xyz_w = frame0.p_cam
table = lm_mod.spawn_landmarks(table, slot, xyz_w, frame0.desc,
                               jnp.int32(0), origin_kf=jnp.int32(0))


@jax.jit
def upd(table):
    return lm_mod.update_observed(cam, table, jnp.eye(4), slot, frame0.uv4,
                                  frame0.desc, frame0.valid, jnp.int32(1),
                                  mode="stereo")


timeit("update_observed (64k table)", upd, table)


@jax.jit
def spawn(table):
    return lm_mod.spawn_landmarks(table, slot, xyz_w, frame0.desc,
                                  jnp.int32(0), origin_kf=jnp.int32(0))


timeit("spawn_landmarks (64k table)", spawn, table)
