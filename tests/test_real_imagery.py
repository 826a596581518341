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
