"""Test fusion-pathology hypothesis (optimization_barrier) + dispatch overhead."""

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


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return out


# dispatch overhead probes
x8 = jnp.zeros(8, jnp.float32)
timeit("trivial add (8,)", jax.jit(lambda x: x + 1.0), x8, iters=100)
x1k = jnp.zeros(1024, jnp.float32)
timeit("trivial add (1024,)", jax.jit(lambda x: x + 1.0), x1k, iters=100)

# chained (dependent) trivial calls — measures round-trip pipelining
f = jax.jit(lambda x: x + 1.0)
y = f(x8)
jax.block_until_ready(y)
t0 = time.perf_counter()
for _ in range(100):
    y = f(y)
jax.block_until_ready(y)
print(f"{'trivial add chained (8,)':46s} {(time.perf_counter()-t0)/100*1e3:8.3f} ms")


def base(img_l, img_r, t):
    kl = detect.detect_keypoints(img_l, t, 16, CAP, 20, "FAST")
    kr = detect.detect_keypoints(img_r, t, 16, CAP, 20, "FAST")
    planes = brief.dense_planes_pair(img_l, img_r)
    dl = brief.gather_descriptors(planes[0], (H, W), kl.uv)
    dr = brief.gather_descriptors(planes[1], (H, W), kr.uv)
    return kl, kr, dl, dr


def make_match(barrier: bool):
    @jax.jit
    def v(img_l, img_r, t):
        kl, kr, dl, dr = base(img_l, img_r, t)
        dist = hamming.hamming_matrix_mxu(dl, dr)
        dv = jnp.abs(kl.uv[:, None, 1] - kr.uv[None, :, 1])
        disp = kl.uv[:, None, 0] - kr.uv[None, :, 0]
        mask = (kl.valid[:, None] & kr.valid[None, :] & (dv <= 1.5)
                & (disp >= 0.0) & (disp <= 200.0))
        if barrier:
            dist, mask = jax.lax.optimization_barrier((dist, mask))
        return hamming.mutual_best_match(dist, mask, jnp.int32(60))

    return v


timeit("match fused (no barrier)", make_match(False), img_l, img_r, thresh)
timeit("match fused (barrier)", make_match(True), img_l, img_r, thresh)


# barrier inside mutual_best_match around d
@jax.jit
def v_bar2(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    dist = hamming.hamming_matrix_mxu(dl, dr)
    dv = jnp.abs(kl.uv[:, None, 1] - kr.uv[None, :, 1])
    disp = kl.uv[:, None, 0] - kr.uv[None, :, 0]
    mask = (kl.valid[:, None] & kr.valid[None, :] & (dv <= 1.5)
            & (disp >= 0.0) & (disp <= 200.0))
    d = jnp.where(mask, dist, hamming.BIG)
    d = jax.lax.optimization_barrier(d)
    best_j = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_i = jnp.argmin(d, axis=0).astype(jnp.int32)
    best = jnp.take_along_axis(d, best_j[:, None], axis=1)[:, 0]
    q_ids = jnp.arange(d.shape[0], dtype=jnp.int32)
    mutual = jnp.take(best_i, best_j) == q_ids
    valid = mutual & (best <= 60)
    return best_j, valid, best


timeit("match fused (barrier on d)", v_bar2, img_l, img_r, thresh)

# argmin on a concrete matrix
dconc = jnp.asarray(rng.integers(0, 256, (CAP, CAP)).astype(np.int32))
timeit("argmin axis=1 concrete", jax.jit(lambda d: jnp.argmin(d, axis=1)), dconc)
timeit("argmin axis=0 concrete", jax.jit(lambda d: jnp.argmin(d, axis=0)), dconc)


# min+compare instead of argmin (VPU-friendlier): compute row min then
# find index by equality-based argmax of a bool.
@jax.jit
def v_minbased(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    dist = hamming.hamming_matrix_mxu(dl, dr)
    dv = jnp.abs(kl.uv[:, None, 1] - kr.uv[None, :, 1])
    disp = kl.uv[:, None, 0] - kr.uv[None, :, 0]
    mask = (kl.valid[:, None] & kr.valid[None, :] & (dv <= 1.5)
            & (disp >= 0.0) & (disp <= 200.0))
    # encode index into value: d*1024 + col  -> min gives both
    col = jax.lax.broadcasted_iota(jnp.int32, (CAP, CAP), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (CAP, CAP), 0)
    dd = jnp.where(mask, dist, hamming.BIG)
    enc_j = dd * CAP + col
    enc_i = dd * CAP + row
    mj = jnp.min(enc_j, axis=1)
    mi = jnp.min(enc_i, axis=0)
    best_j = mj % CAP
    best = mj // CAP
    best_i = mi % CAP
    q_ids = jnp.arange(CAP, dtype=jnp.int32)
    mutual = jnp.take(best_i, best_j) == q_ids
    valid = mutual & (best <= 60)
    return best_j, valid, best


timeit("match min-encoded (no argmin)", v_minbased, img_l, img_r, thresh)
