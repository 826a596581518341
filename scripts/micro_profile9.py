"""Incremental fused-step bisect: add one tail stage at a time."""

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
from vslam_tpu.ops import lie
from vslam_tpu.solve import gn
from vslam_tpu.tracking import fused

H, W = 376, 1241
CAP = 1024
ITERS = 30

cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                          baseline_m=0.5372, rows=H, cols=W)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 255, (2, 2, H, W)).astype(np.uint8))
odom = jnp.tile(jnp.eye(4), (2, 1, 1))
params = fused.FusedParams(capacity=CAP, bin_size=16, retry_attempts=1)
state0 = fused.init_state(cam, params, 65536, 20.0)


def make_partial(stage: int):
    track_fn = frame_mod.track_and_align

    @jax.jit
    def step(cam, state, chunk, idx, odom_chunk):
        imgs = jax.lax.dynamic_index_in_dim(chunk, idx, 0, keepdims=False)
        img_l = imgs[0].astype(jnp.float32)
        img_r = imgs[1].astype(jnp.float32)
        cur, n_kp, n_fp, planes = fused._front_end(cam, params, state, img_l,
                                                   img_r)
        if stage == 0:
            return state._replace(prev=cur, frame_idx=state.frame_idx + 1)
        weights = lm_mod.landmark_weights(state.table, state.prev.landmark_slot)
        res = track_fn(cam, state.prev, cur, jnp.eye(4), state.radius_px,
                       state.desc_gate.astype(jnp.int32), weights,
                       params.gn_config)
        ok = res.converged & state.has_prev
        motion = jnp.where(ok, res.T_cur_prev, jnp.eye(4))
        T_world_cam = state.T_world_cam @ lie.inverse(motion)
        if stage == 1:
            return state._replace(prev=cur, T_world_cam=T_world_cam,
                                  frame_idx=state.frame_idx + 1,
                                  has_prev=jnp.asarray(True))
        prop = frame_mod.propagate_tracks(state.prev, cur, res.prev_to_cur)
        cur = jax.tree.map(lambda a, b: jnp.where(ok, a, b), prop, cur)
        cur, _ = frame_mod.promote_temporary_points(
            cam, state.prev, cur, motion, res.prev_to_cur, enabled=ok)
        if stage == 2:
            return state._replace(prev=cur, T_world_cam=T_world_cam,
                                  frame_idx=state.frame_idx + 1,
                                  has_prev=jnp.asarray(True))
        cur, _ = frame_mod.recover_lost_landmarks(
            cam, state.prev, cur, motion, res.prev_to_cur, planes,
            img_l, img_r, jnp.minimum(state.desc_gate, 50.0),
            jnp.float32(1.0), jnp.float32(200.0), border=20, enabled=ok)
        if stage == 3:
            return state._replace(prev=cur, T_world_cam=T_world_cam,
                                  frame_idx=state.frame_idx + 1,
                                  has_prev=jnp.asarray(True))
        st2 = state._replace(T_world_cam=T_world_cam)
        table, cur, next_slot, n_spawned, free_count = fused._spawn_and_update(
            cam, params, st2, cur)
        if stage == 4:
            return state._replace(prev=cur, table=table,
                                  T_world_cam=T_world_cam,
                                  next_slot=next_slot, free_count=free_count,
                                  frame_idx=state.frame_idx + 1,
                                  has_prev=jnp.asarray(True))
        return state

    return step


def timeit(name, step):
    def call(s):
        return step(cam, s, img, jnp.int32(0), odom)
    s = call(state0)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = call(state0)
    jax.block_until_ready(y)
    print(f"{name:44s} {(time.perf_counter()-t0)/ITERS*1e3:8.3f} ms")


timeit("stage0: frontend only", make_partial(0))
timeit("stage1: + track/align", make_partial(1))
timeit("stage2: + propagate/promote", make_partial(2))
timeit("stage3: + recovery", make_partial(3))
timeit("stage4: + spawn_and_update", make_partial(4))

# full production step for reference
step_full = fused.make_frame_step(params)


def callf(s):
    s2, _ = step_full(cam, s, img, jnp.int32(0), jnp.asarray(False), odom,
                      jnp.asarray(False))
    return s2


s = callf(state0)
jax.block_until_ready(s)
t0 = time.perf_counter()
for _ in range(ITERS):
    y = callf(state0)
jax.block_until_ready(y)
print(f"{'FULL step (1 attempt)':44s} {(time.perf_counter()-t0)/ITERS*1e3:8.3f} ms")
