"""Front-end kernel tests: FAST vs OpenCV oracle, ORB distance statistics,
stereo + projective matching recall on synthetic renders (the role of the
reference's test_stereo_frontend, executables/test_stereo_frontend.cpp)."""

import numpy as np
import jax.numpy as jnp
import cv2

from vslam_tpu.frontend import detect, orb, matching
from vslam_tpu.ops import camera as cam_ops, hamming
from vslam_tpu.io import synthetic

RNG = np.random.default_rng(5)

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)


def blob_image(n=40, size=(320, 640), seed=11):
    rng = np.random.default_rng(seed)
    img = rng.uniform(10, 25, size).astype(np.float32)
    pts = []
    for _ in range(n):
        r = rng.integers(30, size[0] - 30)
        c = rng.integers(30, size[1] - 30)
        if any(abs(r - pr) < 12 and abs(c - pc) < 12 for pr, pc in pts):
            continue
        img[r - 2 : r + 3, c - 2 : c + 3] = rng.uniform(150, 220)
        pts.append((r, c))
    return img, np.array(pts)


def test_fast_detects_blob_corners():
    img, pts = blob_image()
    kps = detect.detect_keypoints(jnp.asarray(img), jnp.float32(20.0),
                                  bin_size=8, capacity=256)
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    # Every blob center must have a detection within 3 px.
    found = 0
    for r, c in pts:
        d = np.abs(uv - np.array([c, r])).max(axis=1) if len(uv) else np.array([99])
        if d.min() <= 3:
            found += 1
    assert found >= 0.9 * len(pts)


def test_fast_flat_image_detects_nothing():
    img = np.full((128, 128), 50.0, np.float32)
    kps = detect.detect_keypoints(jnp.asarray(img), jnp.float32(10.0),
                                  bin_size=8, capacity=64)
    assert not np.any(np.asarray(kps.valid))


def test_fast_agrees_with_opencv_on_corner_set():
    """Our segment-test positives should substantially overlap OpenCV FAST
    (same threshold, with NMS)."""
    img, _ = blob_image(60, seed=23)
    noisy = img + RNG.uniform(-5, 5, img.shape).astype(np.float32)
    thr = 25
    det = cv2.FastFeatureDetector_create(threshold=thr, nonmaxSuppression=True)
    cv_kps = det.detect(noisy.astype(np.uint8))
    cv_uv = np.array([k.pt for k in cv_kps]) if cv_kps else np.zeros((0, 2))
    kps = detect.detect_keypoints(jnp.asarray(noisy), jnp.float32(thr),
                                  bin_size=8, capacity=512, border=10)
    uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
    assert len(uv) > 0 and len(cv_uv) > 0
    # For most OpenCV corners (away from borders) we have one within 2 px.
    hits = 0
    considered = 0
    for p in cv_uv:
        if not (12 < p[0] < 628 and 12 < p[1] < 308):
            continue
        considered += 1
        if np.abs(uv - p).max(axis=1).min() <= 2:
            hits += 1
    assert considered > 0
    assert hits / considered > 0.7


def test_orb_distance_separation():
    """Same-point descriptors across a small viewpoint change must be far
    closer in Hamming distance than different-point pairs (the statistical
    OpenCV-parity criterion from SURVEY.md §7.3)."""
    world = synthetic.make_world(CAM, n_frames=4, n_points=800, seed=3)
    img0, _, _ = synthetic.render_frame(world, 0)
    img1, _, _ = synthetic.render_frame(world, 2)

    k0 = detect.detect_keypoints(jnp.asarray(img0), jnp.float32(25.0), capacity=512, bin_size=12)
    k1 = detect.detect_keypoints(jnp.asarray(img1), jnp.float32(25.0), capacity=512, bin_size=12)
    d0 = orb.describe(jnp.asarray(img0), k0.uv)
    d1 = orb.describe(jnp.asarray(img1), k1.uv)

    v0 = np.asarray(k0.valid)
    v1 = np.asarray(k1.valid)
    dist = np.asarray(hamming.hamming_matrix(d0, d1)).astype(float)
    dist[~v0] = np.nan
    dist[:, ~v1] = np.nan

    best = np.nanmin(dist, axis=1)
    med_all = np.nanmedian(dist)
    med_best = np.nanmedian(best)
    # Matching pairs well separated from the background distribution.
    # (BRIEF bits are spatially correlated, so the background median sits
    # below the 128 of ideal random bits — separation is what matters.)
    assert med_best < 60
    assert med_all > 80
    assert med_best < med_all - 30


def test_stereo_match_recall_on_synthetic():
    world = synthetic.make_world(CAM, n_frames=3, n_points=900, seed=4)
    img_l, img_r, p_cam = synthetic.render_frame(world, 0)
    kl = detect.detect_keypoints(jnp.asarray(img_l), jnp.float32(25.0), capacity=512, bin_size=12)
    kr = detect.detect_keypoints(jnp.asarray(img_r), jnp.float32(25.0), capacity=512, bin_size=12)
    dl = orb.describe(jnp.asarray(img_l), kl.uv)
    dr = orb.describe(jnp.asarray(img_r), kr.uv)
    m = matching.match_stereo(
        kl.uv, dl, kl.valid, kr.uv, dr, kr.valid,
        max_hamming=jnp.int32(60), epipolar_tol=jnp.float32(1.5),
        min_disparity=jnp.float32(1.0), max_disparity=jnp.float32(200.0),
    )
    valid = np.asarray(m.valid) & np.asarray(kl.valid)
    n_match = valid.sum()
    assert n_match > 100

    # Verify matched disparities triangulate to true depths.
    uv_l = np.asarray(kl.uv)[valid]
    uv_r = np.asarray(kr.uv)[np.asarray(m.right_idx)[valid]]
    p_tri, tri_ok = cam_ops.triangulate_disparity(
        CAM, jnp.asarray(uv_l), jnp.asarray(uv_r))
    z_tri = np.asarray(p_tri)[:, 2]
    # Nearest world point depth (rendered patches sit at world points)
    z_true = []
    vis = p_cam[:, 2] > 0.5
    fx, cx, cy = 500.0, 320.0, 160.0
    u_all = fx * p_cam[vis, 0] / p_cam[vis, 2] + cx
    v_all = fx * p_cam[vis, 1] / p_cam[vis, 2] + cy
    pts_px = np.stack([u_all, v_all], 1)
    for uv, z in zip(uv_l, z_tri):
        d = np.abs(pts_px - uv).max(axis=1)
        j = d.argmin()
        # Corners fire anywhere on the 9x9 texture patch -> 6 px tolerance.
        z_true.append(p_cam[vis][j, 2] if d[j] < 6 else np.nan)
    z_true = np.array(z_true)
    ok = ~np.isnan(z_true)
    assert ok.mean() > 0.6
    rel_err = np.abs(z_tri[ok] - z_true[ok]) / z_true[ok]
    assert np.median(rel_err) < 0.1


def test_projective_match_tracks_points():
    world = synthetic.make_world(CAM, n_frames=4, n_points=900, seed=6)
    img0, _, _ = synthetic.render_frame(world, 0)
    img1, _, _ = synthetic.render_frame(world, 1)
    k0 = detect.detect_keypoints(jnp.asarray(img0), jnp.float32(25.0), capacity=512, bin_size=12)
    k1 = detect.detect_keypoints(jnp.asarray(img1), jnp.float32(25.0), capacity=512, bin_size=12)
    d0 = orb.describe(jnp.asarray(img0), k0.uv)
    d1 = orb.describe(jnp.asarray(img1), k1.uv)
    # No motion model: search in a generous window around previous location.
    m = matching.match_projective(
        k0.uv, d0, k0.valid, k1.uv, d1, k1.valid,
        radius_px=jnp.float32(30.0), max_hamming=jnp.int32(60),
    )
    n = int(np.sum(np.asarray(m.valid)))
    assert n > 80
    # Matches should be one-to-one.
    matched = np.asarray(m.cur_idx)[np.asarray(m.valid)]
    assert len(matched) == len(set(matched.tolist()))
