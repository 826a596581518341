"""Kernel experiments: BRIEF band-size/dtype variants + Pallas FAST.
In-session diagnostic only.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=6):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.vslam_tpu_jax_cache")
    )
    from vslam_tpu.frontend.brief import _PAT
    from vslam_tpu.frontend.orb import PATTERN_RADIUS

    _R = PATTERN_RADIUS
    LANE = 128

    def round_up(x, m):
        return -(-x // m) * m

    H, W = 376, 1241
    B = 64  # images (32 frames x 2)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 255, (B, H, W)).astype(np.float32)

    out = {}

    def make_batch_kernel(pat, band, w_out, dtype):
        def kernel(img_ref, out_ref):
            i = pl.program_id(1)
            raw = img_ref[0, pl.ds(i * band, band + 2 * _R), :]
            if dtype == "bf16":
                raw = raw.astype(jnp.bfloat16)

            def tap(dr, dc):
                return jax.lax.slice(
                    raw, (_R + dr, _R + dc),
                    (_R + dr + band, _R + dc + w_out))

            for w in range(8):
                acc = jnp.zeros((band, w_out), jnp.uint32)
                for j in range(32):
                    b = w * 32 + j
                    a = tap(int(pat[b, 0, 0]), int(pat[b, 0, 1]))
                    c = tap(int(pat[b, 1, 0]), int(pat[b, 1, 1]))
                    acc = acc + (a < c).astype(jnp.uint32) * np.uint32(1 << j)
                out_ref[0, w] = acc
        return kernel

    def run_variant(name, band, dtype):
        Hb = round_up(H, band)
        Wo = round_up(W, LANE)
        Wi = round_up(Wo + 2 * _R, LANE)
        Hi = round_up(Hb + 2 * _R, 8)

        @jax.jit
        def f(x):
            padded = jnp.zeros((B, Hi, Wi), x.dtype)
            padded = jax.lax.dynamic_update_slice(padded, x, (0, _R, _R))
            kernel = make_batch_kernel(np.asarray(_PAT), band, Wo, dtype)
            return pl.pallas_call(
                kernel,
                grid=(B, Hb // band),
                in_specs=[pl.BlockSpec((1, Hi, Wi), lambda b, i: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, band, Wo),
                                       lambda b, i: (b, 0, i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, 8, Hb, Wo), jnp.uint32),
            )(padded)

        x = jax.device_put(imgs)
        try:
            jax.block_until_ready(f(x))
            # per image-pair (2 images)
            out[name] = round(1e3 * timeit(lambda: jax.block_until_ready(f(x))) / (B // 2), 3)
        except Exception as e:  # noqa
            out[name] = f"ERR {str(e)[:120]}"

    run_variant("brief_band8_f32", 8, "f32")
    run_variant("brief_band16_f32", 16, "f32")
    run_variant("brief_band32_f32", 32, "f32")
    run_variant("brief_band64_f32", 64, "f32")
    run_variant("brief_band32_bf16", 32, "bf16")

    print(out)


if __name__ == "__main__":
    main()
