"""Bisect the composed-frontend 5ms pathology."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.vslam_tpu_jax_cache"))

from vslam_tpu.frontend import brief, detect
from vslam_tpu.ops import hamming

H, W = 376, 1241
CAP = 1024
ITERS = 30

rng = np.random.default_rng(0)
img_l = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
img_r = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
thresh = jnp.float32(20.0)
dl_c = jnp.asarray(rng.integers(0, 2**32, (CAP, 8), dtype=np.uint64).astype(np.uint32))
dr_c = jnp.asarray(rng.integers(0, 2**32, (CAP, 8), dtype=np.uint64).astype(np.uint32))
uv_c = jnp.asarray(rng.random((CAP, 2)).astype(np.float32) * 300)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return out


def match_part(uv_l, dl, vl, uv_r, dr, vr):
    dist = hamming.hamming_matrix_mxu(dl, dr)
    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    disp = uv_l[:, None, 0] - uv_r[None, :, 0]
    mask = (vl[:, None] & vr[None, :] & (dv <= 1.5)
            & (disp >= 0.0) & (disp <= 200.0))
    return hamming.mutual_best_match(dist, mask, jnp.int32(60))


@jax.jit
def v_barrier_after_base(img_l, img_r, t):
    kl = detect.detect_keypoints(img_l, t, 16, CAP, 20, "FAST")
    kr = detect.detect_keypoints(img_r, t, 16, CAP, 20, "FAST")
    planes = brief.dense_planes_pair(img_l, img_r)
    dl = brief.gather_descriptors(planes[0], (H, W), kl.uv)
    dr = brief.gather_descriptors(planes[1], (H, W), kr.uv)
    dl, dr, uvl, uvr, vl, vr = jax.lax.optimization_barrier(
        (dl, dr, kl.uv, kr.uv, kl.valid, kr.valid))
    return match_part(uvl, dl, vl, uvr, dr, vr)


@jax.jit
def v_detect_concrete_desc(img_l, img_r, t):
    kl = detect.detect_keypoints(img_l, t, 16, CAP, 20, "FAST")
    kr = detect.detect_keypoints(img_r, t, 16, CAP, 20, "FAST")
    return match_part(kl.uv, dl_c, kl.valid, kr.uv, dr_c, kr.valid)


@jax.jit
def v_gather_concrete_uv(img_l, img_r, t):
    planes = brief.dense_planes_pair(img_l, img_r)
    dl = brief.gather_descriptors(planes[0], (H, W), uv_c)
    dr = brief.gather_descriptors(planes[1], (H, W), uv_c)
    ones = jnp.ones(CAP, bool)
    return match_part(uv_c, dl, ones, uv_c, dr, ones)


@jax.jit
def v_all_concrete(a):
    ones = jnp.ones(CAP, bool)
    return match_part(uv_c + a, dl_c, ones, uv_c, dr_c, ones)


timeit("barrier after base", v_barrier_after_base, img_l, img_r, thresh)
timeit("detect real + concrete desc", v_detect_concrete_desc, img_l, img_r, thresh)
timeit("gather real + concrete uv", v_gather_concrete_uv, img_l, img_r, thresh)
timeit("all concrete (match only)", v_all_concrete, jnp.float32(0.0))
