"""Fused Pallas front-end kernel (blur + BRIEF + FAST + NMS + row
reduction) vs the staged XLA reference path, through the Pallas
interpreter on CPU (the compiled kernel is TPU-only; on hardware the same
checks hold bit-exactly — validated in-session on v5e).

Reference behavior being fused: detector FAST + descriptor BRIEF
(base_framepoint_generator.cpp:9-25,184-197).
"""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.frontend import brief, detect
from vslam_tpu.frontend.pallas_frontend import (
    _BAND,
    fast_brief_frontend_pair,
    keypoints_from_band_reduction,
)

RNG = np.random.default_rng(7)
B = 16  # interior margin (kernel halo; detection border >= this)


def _imgs(h=96, w=260):
    return RNG.uniform(0, 255, (2, h, w)).astype(np.float32)


def test_planes_and_score_interior_exact():
    imgs = _imgs()
    thr = jnp.float32(18.0)
    planes, score, _, _ = fast_brief_frontend_pair(
        jnp.asarray(imgs), thr, interpret=True
    )
    for b in range(2):
        img = jnp.asarray(imgs[b])
        ref_score = np.asarray(detect.nms3(detect.fast_score_map(img, thr)))
        ref_planes = np.asarray(brief.dense_bit_planes(img))
        assert np.array_equal(
            np.asarray(score)[b][B:-B, B:-B], ref_score[B:-B, B:-B]
        )
        assert np.array_equal(
            np.asarray(planes)[b][:, B:-B, B:-B], ref_planes[:, B:-B, B:-B]
        )


def test_fast12_score_interior_exact():
    imgs = _imgs(80, 200)
    thr = jnp.float32(25.0)
    _, score, _, _ = fast_brief_frontend_pair(
        jnp.asarray(imgs), thr, arc_len=12, interpret=True
    )
    ref = np.asarray(
        detect.nms3(detect.fast_score_map(jnp.asarray(imgs[0]), thr,
                                          arc_len=12))
    )
    assert np.array_equal(np.asarray(score)[0][B:-B, B:-B], ref[B:-B, B:-B])


def test_band_reduction_keypoints_match_generic_tail():
    """The in-kernel row reduction + small binning tail selects the same
    keypoints as the image-sized generic tail (continuous scores — the
    two differ only in intra-bin tie order)."""
    imgs = _imgs(128, 384)
    thr = jnp.float32(12.0)
    border, bin_size, capacity = 20, _BAND, 128
    _, score, rowmax, rowarg = fast_brief_frontend_pair(
        jnp.asarray(imgs), thr, border=border, bin_size=bin_size,
        interpret=True,
    )
    H, W = imgs.shape[1:]
    for b in range(2):
        uv_a, s_a, va_a = keypoints_from_band_reduction(
            rowmax[b], rowarg[b], H, W, bin_size, capacity
        )
        uv_b, s_b, va_b = detect.keypoints_from_score(
            score[b], bin_size, capacity, border
        )
        va_a, va_b = np.asarray(va_a), np.asarray(va_b)
        assert np.array_equal(va_a, va_b)
        # Same (score-sorted) keypoint set.
        got = {tuple(map(float, p)) for p in np.asarray(uv_a)[va_a]}
        want = {tuple(map(float, p)) for p in np.asarray(uv_b)[va_b]}
        assert got == want
        assert np.allclose(np.asarray(s_a)[va_a], np.asarray(s_b)[va_b])
