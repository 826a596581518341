"""Dense BRIEF vs naive per-keypoint oracle."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.frontend import brief
from vslam_tpu.frontend.orb import box_blur
from vslam_tpu.ops import hamming

RNG = np.random.default_rng(37)


def naive_brief(img, uv):
    smooth = np.asarray(box_blur(jnp.asarray(img), 2))
    pat = brief._PAT
    out = np.zeros((len(uv), 256), np.uint8)
    for i, (c, r) in enumerate(uv.astype(int)):
        for b in range(256):
            dr1, dc1 = pat[b, 0]
            dr2, dc2 = pat[b, 1]
            out[i, b] = smooth[r + dr1, c + dc1] < smooth[r + dr2, c + dc2]
    return out


def test_dense_brief_matches_naive():
    img = RNG.uniform(0, 255, (120, 160)).astype(np.float32)
    uv = np.stack([RNG.uniform(20, 140, 64), RNG.uniform(20, 100, 64)], 1)
    uv = np.round(uv).astype(np.float32)
    desc = np.asarray(brief.describe_dense(jnp.asarray(img), jnp.asarray(uv)))
    oracle_bits = naive_brief(img, uv)
    got_bits = np.asarray(hamming.unpack_bits(jnp.asarray(desc)))
    # conv uses < vs <= tie-handling and low-precision accumulation: allow
    # a few unstable bits where the pair difference is ~0.
    mismatch = (got_bits != oracle_bits).sum(axis=1)
    assert mismatch.max() <= 8, mismatch
    assert np.median(mismatch) <= 2


def test_dense_brief_discriminates():
    img = RNG.uniform(0, 255, (100, 200)).astype(np.float32)
    uv = np.stack([RNG.uniform(20, 180, 32), RNG.uniform(20, 80, 32)], 1).astype(np.float32)
    desc = brief.describe_dense(jnp.asarray(img), jnp.asarray(np.round(uv)))
    d = np.array(hamming.hamming_matrix(desc, desc))
    np.fill_diagonal(d, 999)
    # distinct noise locations should be far apart (bits are spatially
    # correlated by the smoothing, so the floor sits below the 128 of
    # ideal random bits)
    assert d.min() > 40
