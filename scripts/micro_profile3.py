"""Chase the match_stereo-in-composition anomaly + solver variants."""

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


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return out


def base(img_l, img_r, t):
    kl = detect.detect_keypoints(img_l, t, 16, CAP, 20, "FAST")
    kr = detect.detect_keypoints(img_r, t, 16, CAP, 20, "FAST")
    planes = brief.dense_planes_pair(img_l, img_r)
    dl = brief.gather_descriptors(planes[0], (H, W), kl.uv)
    dr = brief.gather_descriptors(planes[1], (H, W), kr.uv)
    return kl, kr, dl, dr


@jax.jit
def v_mxu_only(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    return hamming.hamming_matrix_mxu(dl, dr)


@jax.jit
def v_pop_only(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    return hamming.hamming_matrix(dl, dr)


@jax.jit
def v_mxu_argmin(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    dist = hamming.hamming_matrix_mxu(dl, dr)
    dv = jnp.abs(kl.uv[:, None, 1] - kr.uv[None, :, 1])
    disp = kl.uv[:, None, 0] - kr.uv[None, :, 0]
    mask = (kl.valid[:, None] & kr.valid[None, :] & (dv <= 1.5)
            & (disp >= 0.0) & (disp <= 200.0))
    return hamming.mutual_best_match(dist, mask, jnp.int32(60))


@jax.jit
def v_f32_matmul(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    qb = hamming.unpack_bits(dl).astype(jnp.float32)
    db = hamming.unpack_bits(dr).astype(jnp.float32)
    inner = qb @ db.T
    rq = jnp.sum(qb, axis=1)
    rdb = jnp.sum(db, axis=1)
    dist = (rq[:, None] + rdb[None, :] - 2.0 * inner).astype(jnp.int32)
    dv = jnp.abs(kl.uv[:, None, 1] - kr.uv[None, :, 1])
    disp = kl.uv[:, None, 0] - kr.uv[None, :, 0]
    mask = (kl.valid[:, None] & kr.valid[None, :] & (dv <= 1.5)
            & (disp >= 0.0) & (disp <= 200.0))
    return hamming.mutual_best_match(dist, mask, jnp.int32(60))


@jax.jit
def v_pop_argmin(img_l, img_r, t):
    kl, kr, dl, dr = base(img_l, img_r, t)
    dist = hamming.hamming_matrix(dl, dr)
    dv = jnp.abs(kl.uv[:, None, 1] - kr.uv[None, :, 1])
    disp = kl.uv[:, None, 0] - kr.uv[None, :, 0]
    mask = (kl.valid[:, None] & kr.valid[None, :] & (dv <= 1.5)
            & (disp >= 0.0) & (disp <= 200.0))
    return hamming.mutual_best_match(dist, mask, jnp.int32(60))


timeit("base + mxu matrix only", v_mxu_only, img_l, img_r, thresh)
timeit("base + popcount matrix only", v_pop_only, img_l, img_r, thresh)
timeit("base + mxu + mask/argmin", v_mxu_argmin, img_l, img_r, thresh)
timeit("base + f32 matmul + mask/argmin", v_f32_matmul, img_l, img_r, thresh)
timeit("base + popcount + mask/argmin", v_pop_argmin, img_l, img_r, thresh)

# solver micro: batched 3x3 cho_solve vs closed form
M = 1024
A = jnp.asarray(rng.random((M, 3, 3)).astype(np.float32))
Hs = jnp.einsum("nij,nkj->nik", A, A) + 3.0 * jnp.eye(3)
b = jnp.asarray(rng.random((M, 3)).astype(np.float32))


@jax.jit
def cho_batch(Hs, b):
    def one(Hm, bm):
        L = jax.scipy.linalg.cho_factor(Hm, lower=True)
        return jax.scipy.linalg.cho_solve(L, bm)
    return jax.vmap(one)(Hs, b)


@jax.jit
def cramer_batch(Hs, b):
    # 3x3 solve via adjugate (Cramer) — pure elementwise VPU work.
    a, bb, c = Hs[:, 0, 0], Hs[:, 0, 1], Hs[:, 0, 2]
    d, e, f = Hs[:, 1, 0], Hs[:, 1, 1], Hs[:, 1, 2]
    g, h, i = Hs[:, 2, 0], Hs[:, 2, 1], Hs[:, 2, 2]
    det = a * (e * i - f * h) - bb * (d * i - f * g) + c * (d * h - e * g)
    inv_det = 1.0 / det
    adj = jnp.stack([
        e * i - f * h, c * h - bb * i, bb * f - c * e,
        f * g - d * i, a * i - c * g, c * d - a * f,
        d * h - e * g, bb * g - a * h, a * e - bb * d,
    ], axis=-1).reshape(-1, 3, 3)
    return jnp.einsum("nij,nj->ni", adj, b) * inv_det[:, None]


r1 = timeit("batched 3x3 cho_solve (1024)", cho_batch, Hs, b)
r2 = timeit("batched 3x3 cramer (1024)", cramer_batch, Hs, b)
print("max diff:", float(jnp.max(jnp.abs(r1 - r2))))

# 6x6 single solve: cho vs lu vs explicit
A6 = jnp.asarray(rng.random((6, 6)).astype(np.float32))
H6 = A6 @ A6.T + 6.0 * jnp.eye(6)
b6 = jnp.asarray(rng.random(6).astype(np.float32))


@jax.jit
def cho6(H6, b6):
    L = jax.scipy.linalg.cho_factor(H6, lower=True)
    return jax.scipy.linalg.cho_solve(L, b6)


@jax.jit
def solve6(H6, b6):
    return jnp.linalg.solve(H6, b6)


timeit("6x6 cho_solve", cho6, H6, b6)
timeit("6x6 jnp.linalg.solve", solve6, H6, b6)
