"""Pallas dense-BRIEF kernel vs numpy shifted-compare oracle.

The compiled kernel runs on TPU only; these tests exercise the identical
kernel body through the Pallas interpreter on CPU.  (The TPU build is
additionally validated bit-exactly against this same oracle on hardware;
note the in-kernel 2^j multiply — Mosaic miscompiles uint32 `<< j` for
j >= 16 on v5e, which interpret mode does not catch.)
"""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.frontend import brief
from vslam_tpu.frontend.pallas_brief import (
    dense_bit_planes_pallas,
    dense_bit_planes_pallas_batch,
)

RNG = np.random.default_rng(11)
R = 13


def oracle_planes(s: np.ndarray) -> np.ndarray:
    pat = brief._PAT
    H, W = s.shape
    sp = np.zeros((H + 2 * R, W + 2 * R), np.float32)
    sp[R:-R, R:-R] = s
    out = np.zeros((8, H, W), np.uint32)
    for w in range(8):
        acc = np.zeros((H, W), np.uint32)
        for j in range(32):
            b = w * 32 + j
            dr1, dc1 = pat[b, 0]
            dr2, dc2 = pat[b, 1]
            a = sp[R + dr1 : R + dr1 + H, R + dc1 : R + dc1 + W]
            c = sp[R + dr2 : R + dr2 + H, R + dc2 : R + dc2 + W]
            acc |= (a < c).astype(np.uint32) << np.uint32(j)
        out[w] = acc
    return out


def test_single_matches_oracle():
    s = RNG.uniform(0, 255, (40, 150)).astype(np.float32)
    got = np.asarray(dense_bit_planes_pallas(jnp.asarray(s), interpret=True))
    assert np.array_equal(got, oracle_planes(s))


def test_batch_matches_oracle():
    s = RNG.uniform(0, 255, (2, 24, 140)).astype(np.float32)
    got = np.asarray(
        dense_bit_planes_pallas_batch(jnp.asarray(s), interpret=True)
    )
    for b in range(2):
        assert np.array_equal(got[b], oracle_planes(s[b]))
