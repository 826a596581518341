"""Micro-profile the stereo front-end sub-stages on the real TPU (batched
over a 32-frame chunk to amortize dispatch latency).  In-session diagnostic.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=4):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.vslam_tpu_jax_cache")
    )
    from vslam_tpu.frontend import brief, detect, matching
    from vslam_tpu.io import synthetic
    from vslam_tpu.ops import camera as cam_ops

    cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                              baseline_m=0.5372, rows=376, cols=1241)
    B = 32
    poses = synthetic.circle_trajectory(B, radius=13.0)
    world = synthetic.make_world(cam, n_points=7000, seed=0, poses=poses)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(B)]
    chunk = np.stack([np.stack(f).astype(np.uint8) for f in frames])
    chunk_dev = jax.device_put(chunk)
    thr = jnp.float32(20.0)

    out = {}

    # detect only (both images)
    @jax.jit
    def f_detect(c):
        def one(pair):
            kl = detect.detect_keypoints(pair[0], thr, 16, 1024, 20, "FAST")
            kr = detect.detect_keypoints(pair[1], thr, 16, 1024, 20, "FAST")
            return kl.uv, kr.uv, kl.valid, kr.valid
        return jax.vmap(one)(c)

    r = f_detect(chunk_dev)
    out["detect_ms"] = round(1e3 * timeit(lambda: jax.block_until_ready(f_detect(chunk_dev))) / B, 3)

    # dense BRIEF planes only
    @jax.jit
    def f_planes(c):
        def one(pair):
            return brief.dense_planes_pair(pair[0], pair[1])
        return jax.vmap(one)(c)

    jax.block_until_ready(f_planes(chunk_dev))
    out["brief_planes_ms"] = round(1e3 * timeit(lambda: jax.block_until_ready(f_planes(chunk_dev))) / B, 3)

    # detect + planes + gather
    @jax.jit
    def f_det_desc(c):
        def one(pair):
            kl = detect.detect_keypoints(pair[0], thr, 16, 1024, 20, "FAST")
            kr = detect.detect_keypoints(pair[1], thr, 16, 1024, 20, "FAST")
            planes = brief.dense_planes_pair(pair[0], pair[1])
            dl = brief.gather_descriptors(planes[0], pair[0].shape, kl.uv)
            dr = brief.gather_descriptors(planes[1], pair[1].shape, kr.uv)
            return kl.uv, kr.uv, dl, dr, kl.valid, kr.valid
        return jax.vmap(one)(c)

    jax.block_until_ready(f_det_desc(chunk_dev))
    out["det_desc_ms"] = round(1e3 * timeit(lambda: jax.block_until_ready(f_det_desc(chunk_dev))) / B, 3)

    # + stereo match
    @jax.jit
    def f_full(c):
        def one(pair):
            kl = detect.detect_keypoints(pair[0], thr, 16, 1024, 20, "FAST")
            kr = detect.detect_keypoints(pair[1], thr, 16, 1024, 20, "FAST")
            planes = brief.dense_planes_pair(pair[0], pair[1])
            dl = brief.gather_descriptors(planes[0], pair[0].shape, kl.uv)
            dr = brief.gather_descriptors(planes[1], pair[1].shape, kr.uv)
            m = matching.match_stereo(kl.uv, dl, kl.valid, kr.uv, dr, kr.valid,
                                      jnp.int32(60), jnp.float32(1.5),
                                      jnp.float32(0.0), jnp.float32(200.0))
            return m.right_idx, m.valid
        return jax.vmap(one)(c)

    jax.block_until_ready(f_full(chunk_dev))
    out["det_desc_match_ms"] = round(1e3 * timeit(lambda: jax.block_until_ready(f_full(chunk_dev))) / B, 3)

    print(out)


if __name__ == "__main__":
    main()
