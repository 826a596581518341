"""Front-end validation on REAL photographs (not synthetic renders).

The reference repo ships real images used for its feature-matching
experiments (resources/images/stitch_image*.jpg — overlapping photo pairs
scored per descriptor in result1_*.png filenames).  These tests use them as
read-only fixtures, playing the role SURVEY.md §7.2 step 4 assigns to
"validate each kernel against OpenCV on real pairs":

  * FAST detection agreement with cv2.FastFeatureDetector on a real photo;
  * dense-BRIEF matching across a real overlapping pair must recover a
    dominant homography (cv2.findHomography RANSAC) with a solid inlier
    count — descriptor bits computed by the TPU kernel are discriminative
    on real texture, not just on the synthetic splat worlds.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from vslam_tpu.frontend import brief, detect
from vslam_tpu.ops import hamming

IMG_DIR = "/root/reference/resources/images"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(IMG_DIR), reason="reference image fixtures not present"
)


def load(name):
    img = cv2.imread(os.path.join(IMG_DIR, name), cv2.IMREAD_GRAYSCALE)
    assert img is not None, name
    return img.astype(np.float32)


def test_fast_agrees_with_opencv_on_real_photo():
    img = load("stitch_image1_1.jpg")
    thr = 25
    kp = detect.detect_keypoints(
        jnp.asarray(img), jnp.float32(thr), bin_size=12, capacity=512, border=20
    )
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert len(uv) >= 100, "real photo yields a dense corner set"

    det = cv2.FastFeatureDetector_create(threshold=thr, nonmaxSuppression=True)
    ref = np.array([k.pt for k in det.detect(img.astype(np.uint8))], np.float32)
    assert len(ref) > 0
    # Every kept corner should coincide with an OpenCV FAST corner (the
    # per-bin argmax keeps a strong subset; 2 px tolerates nms tie-breaks).
    d = np.linalg.norm(uv[:, None, :] - ref[None, :, :], axis=-1).min(axis=1)
    agreement = float((d <= 2.0).mean())
    assert agreement >= 0.8, f"agreement {agreement:.2f}"


@pytest.mark.parametrize("pair", [("stitch_image1_1.jpg", "stitch_image1_2.jpg"),
                                  ("stitch_image2_1.jpg", "stitch_image2_2.jpg")])
def test_brief_matching_recovers_homography_on_real_pair(pair):
    im1, im2 = load(pair[0]), load(pair[1])

    def frontend(img):
        kp = detect.detect_keypoints(
            jnp.asarray(img), jnp.float32(20.0), bin_size=12, capacity=512,
            border=20,
        )
        desc = brief.describe_dense(jnp.asarray(img), kp.uv)
        v = np.asarray(kp.valid)
        return np.asarray(kp.uv)[v], np.asarray(desc)[v]

    uv1, d1 = frontend(im1)
    uv2, d2 = frontend(im2)
    assert len(uv1) >= 100 and len(uv2) >= 100

    dist = np.asarray(
        hamming.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2))
    )
    best_j = dist.argmin(1)
    best_i = dist.argmin(0)
    mutual = best_i[best_j] == np.arange(len(uv1))
    gated = dist[np.arange(len(uv1)), best_j] <= 60
    sel = mutual & gated
    assert sel.sum() >= 40, f"only {sel.sum()} mutual matches"

    src = uv1[sel].astype(np.float32)
    dst = uv2[best_j[sel]].astype(np.float32)
    H, inl = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
    assert H is not None
    n_inl = int(inl.sum())
    ratio = n_inl / len(src)
    # The pairs are overlapping photos with a real perspective change:
    # unrotated BRIEF (the reference's default descriptor) must still
    # concentrate a solid fraction of matches on one homography — random
    # matches would scatter (RANSAC inlier ratio ~0.05 at 3 px on 512x384).
    assert n_inl >= 45 and ratio >= 0.3, (n_inl, ratio)


def _multi_octave_desc(img, octaves, capacity=512, thr=25.0):
    """Detect + describe over the pyramid (mirrors the production
    per-octave gather in mapping/frame._pyramid_descriptors)."""
    kp = detect.detect_keypoints(
        jnp.asarray(img), jnp.float32(thr), bin_size=12, capacity=capacity,
        border=20, octaves=octaves,
    )
    caps = detect.octave_capacities(capacity, octaves)
    parts = []
    lvl = jnp.asarray(img)
    start = 0
    for o, cap_o in enumerate(caps):
        if o > 0:
            lvl = detect.downsample2(lvl)
        planes = brief.dense_planes(lvl)
        s = float(1 << o)
        sl = slice(start, start + cap_o)
        parts.append(brief.gather_descriptors(
            planes, lvl.shape, (kp.uv[sl] - (s - 1.0) / 2.0) / s
        ))
        start += cap_o
    return np.asarray(kp.uv), np.asarray(jnp.concatenate(parts)), np.asarray(kp.valid)


def _cross_scale_matches(img, scale, octaves):
    """Match a photo against a rescaled copy of itself; count matches that
    agree with the known scale map."""
    h, w = img.shape
    small = cv2.resize(img, (int(w * scale), int(h * scale)),
                       interpolation=cv2.INTER_AREA).astype(np.float32)
    uv_a, d_a, va = _multi_octave_desc(img, octaves)
    uv_b, d_b, vb = _multi_octave_desc(small, octaves)
    dist = np.asarray(hamming.hamming_matrix_mxu(jnp.asarray(d_a),
                                                 jnp.asarray(d_b)))
    dist = np.where(va[:, None] & vb[None, :], dist, 1 << 20)
    best_j = dist.argmin(axis=1)
    best_i = dist.argmin(axis=0)
    best = dist[np.arange(len(best_j)), best_j]
    mutual = best_i[best_j] == np.arange(len(best_j))
    ok = mutual & (best <= 60)
    pred = uv_b[best_j] / scale  # where the match SHOULD be in A coords
    geom = np.linalg.norm(uv_a - pred, axis=1) <= 4.0
    return int((ok & geom).sum())


def test_pyramid_survives_scale_change():
    """Approach-sequence robustness (VERDICT: single-octave FAST + BRIEF
    sheds tracks under scale change that the reference's multi-octave
    detectors keep, base_framepoint_generator.cpp:52-70): matching a real
    photo against a 0.55x copy of itself must work with a 2-level pyramid
    and fail (or nearly) without one."""
    img = load("stitch_image1_1.jpg")
    n1 = _cross_scale_matches(img, 0.55, octaves=1)
    n2 = _cross_scale_matches(img, 0.55, octaves=2)
    assert n2 >= 30, f"pyramid matching too weak: {n2}"
    assert n2 >= 2 * max(n1, 1), f"pyramid {n2} vs single {n1}"


def test_bit_distance_distribution_vs_opencv():
    """Descriptor-fidelity check (SURVEY §7.3): on a real photo under a
    known small shift, OUR matching-pair Hamming distances must be far
    from the random-pair distribution — and comparable to cv2 ORB's on
    the same geometry — so reference-derived thresholds transfer."""
    img = load("stitch_image1_1.jpg")
    h, w = img.shape
    dx = 24
    shifted = img[:, dx:]
    cropped = img[:, : w - dx]
    kp = detect.detect_keypoints(
        jnp.asarray(cropped), jnp.float32(25.0), bin_size=12, capacity=512,
        border=40,
    )
    va = np.asarray(kp.valid)
    uv = np.asarray(kp.uv)[va]
    # The same scene point sits at u - dx in the shifted image.
    uv_b = uv - np.array([dx, 0], np.float32)
    d_a = np.asarray(brief.describe_dense(jnp.asarray(cropped), jnp.asarray(uv)))
    d_b = np.asarray(brief.describe_dense(jnp.asarray(shifted), jnp.asarray(uv_b)))
    match_d = np.asarray(hamming.hamming_pairwise(jnp.asarray(d_a),
                                                  jnp.asarray(d_b)))
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(d_b))
    rand_d = np.asarray(hamming.hamming_pairwise(jnp.asarray(d_a),
                                                 jnp.asarray(d_b[perm])))
    # Matching pairs concentrate far below the tracking gate (60 bits);
    # random pairs center near 128.
    assert np.median(match_d) < 30, np.median(match_d)
    assert np.quantile(match_d, 0.8) <= 60, np.quantile(match_d, 0.8)
    assert np.median(rand_d) > 90, np.median(rand_d)

    # cv2 ORB on the same geometry for calibration: our matching-pair
    # separation (random minus match medians) must be in the same league.
    orb_cv = cv2.ORB_create(nfeatures=512)
    kps = [cv2.KeyPoint(float(u), float(v), 31) for u, v in uv]
    kps_b = [cv2.KeyPoint(float(u), float(v), 31) for u, v in uv_b]
    _, da_cv = orb_cv.compute(cropped.astype(np.uint8), kps)
    _, db_cv = orb_cv.compute(shifted.astype(np.uint8), kps_b)
    if da_cv is not None and db_cv is not None and len(da_cv) == len(db_cv):
        cv_match = np.unpackbits(da_cv ^ db_cv, axis=1).sum(axis=1)
        cv_rand = np.unpackbits(
            da_cv ^ db_cv[rng.permutation(len(db_cv))], axis=1
        ).sum(axis=1)
        ours = np.median(rand_d) - np.median(match_d)
        cvs = np.median(cv_rand) - np.median(cv_match)
        assert ours >= 0.6 * cvs, (ours, cvs)


def test_rotated_banks_survive_in_plane_rotation():
    """BRIEF256R (rotated pattern banks + dense orientation map) matches a
    real photo against a 35-degree-rotated copy where plain dense BRIEF
    fails (EuRoC-class in-plane rotation robustness; reference ORB
    steering, base_framepoint_generator.cpp:184-224)."""
    img = load("stitch_image1_1.jpg")
    h, w = img.shape
    angle = 35.0
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    rot = cv2.warpAffine(img, M, (w, h)).astype(np.float32)

    kp_a = detect.detect_keypoints(
        jnp.asarray(img), jnp.float32(25.0), bin_size=12, capacity=512,
        border=40,
    )
    va = np.asarray(kp_a.valid)
    uv_a = np.asarray(kp_a.uv)
    # True corresponding coordinates in the rotated image.
    uv_b = (np.c_[uv_a, np.ones(len(uv_a))] @ M.T).astype(np.float32)
    inb = (
        va
        & (uv_b[:, 0] > 40) & (uv_b[:, 0] < w - 40)
        & (uv_b[:, 1] > 40) & (uv_b[:, 1] < h - 40)
    )

    def match_frac(describe):
        d_a = np.asarray(describe(jnp.asarray(img), jnp.asarray(uv_a)))
        d_b = np.asarray(describe(jnp.asarray(rot), jnp.asarray(uv_b)))
        dist = np.asarray(
            hamming.hamming_pairwise(jnp.asarray(d_a), jnp.asarray(d_b))
        )[inb]
        return float((dist <= 60).mean()), float(np.median(dist))

    frac_r, med_r = match_frac(brief.describe_dense_rotated)
    frac_p, med_p = match_frac(brief.describe_dense)
    # Rotated banks keep a solid majority under the gate; plain BRIEF
    # collapses to near-random distances.
    assert frac_r >= 0.5, (frac_r, med_r)
    assert med_r + 25 < med_p, (med_r, med_p)
    assert frac_r >= frac_p + 0.25, (frac_r, frac_p)
