"""Pluggable detector zoo (reference Detector hierarchy,
base_framepoint_generator.h:10-107): every detector option finds the
synthetic corners, Harris/Shi-Tomasi agree with their textbook definitions
on an oracle patch, and an end-to-end tracker run works on a non-FAST
detector."""

import numpy as np
import jax.numpy as jnp
import pytest

from vslam_tpu.frontend import detect
from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)


@pytest.fixture(scope="module")
def image():
    world = synthetic.make_world(CAM, n_frames=3, n_points=1500, seed=5)
    img, _, _ = synthetic.render_frame(world, 0)
    return img, world


@pytest.mark.parametrize("det", ["FAST", "FAST12", "AGAST", "HARRIS", "GFTT"])
def test_detector_finds_corners(image, det):
    img, _ = image
    kp = detect.detect_keypoints(
        jnp.asarray(img), jnp.float32(10.0), 12, 512, 20, det
    )
    n = int(np.asarray(kp.valid).sum())
    assert n > 80, f"{det}: only {n} keypoints"


def test_harris_oracle():
    """Harris response on an ideal corner >> response on an edge."""
    img = np.zeros((64, 64), np.float32)
    img[32:, 32:] = 255.0  # corner at (32, 32)
    s = np.asarray(detect.harris_score_map(jnp.asarray(img), jnp.float32(0.0)))
    corner = s[29:37, 29:37].max()
    assert corner > 50.0
    # Along the edges, far from the corner: no response.
    assert s[45:60, 28:38].max() < 0.05 * corner  # vertical edge below
    assert s[28:38, 45:60].max() < 0.05 * corner  # horizontal edge right


def test_gftt_oracle():
    """Min-eigenvalue is ~0 on a pure edge, positive on a corner."""
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 255.0  # pure vertical edge, no corner
    s = np.asarray(detect.gftt_score_map(jnp.asarray(img), jnp.float32(0.0)))
    assert s[10:54, :].max() < 1.0
    img[32:, :32] = 255.0  # now rows>32 are all bright -> corner at (32,32)
    s2 = np.asarray(detect.gftt_score_map(jnp.asarray(img), jnp.float32(0.0)))
    assert s2[29:36, 29:36].max() > 5.0


def test_tracker_runs_with_harris(image):
    _, world = image
    from vslam_tpu.tracking.tracker import PoseTracker
    from vslam_tpu.eval import trajectory as traj_eval

    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.framepoint_generation.detector_type = "HARRIS"
    cfg.framepoint_generation.detector_threshold_starting_value = 10.0
    tracker = PoseTracker(CAM, cfg, landmark_capacity=8192)
    world2 = synthetic.make_world(CAM, n_frames=8, n_points=2000, seed=6, step=0.3)
    for t in range(8):
        l, r, _ = synthetic.render_frame(world2, t)
        tracker.compute(l, r)
    est = np.stack(tracker.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world2.poses)
    assert tracker.stats.n_breaks == 0
    assert rmse < 0.1, rmse


def test_dog_oracle_blobs():
    """DoG finds bright AND dark blobs at their centers, not edges."""
    img = np.full((96, 96), 128.0, np.float32)
    yy, xx = np.mgrid[0:96, 0:96]
    # bright and dark blobs of sigma ~2 (inside the intra-octave scale
    # ladder; larger blob scales are covered by pyramid octaves)
    img += 120.0 * np.exp(-((yy - 24) ** 2 + (xx - 24) ** 2) / (2 * 2.0**2))
    img -= 110.0 * np.exp(-((yy - 70) ** 2 + (xx - 60) ** 2) / (2 * 2.0**2))
    s = np.asarray(detect.dog_score_map(jnp.asarray(img), jnp.float32(5.0)))
    # peak response within 3 px of each blob center
    assert s[21:28, 21:28].max() > 0.0
    assert s[67:74, 57:64].max() > 0.0
    # a pure step edge must not fire
    edge = np.zeros((96, 96), np.float32)
    edge[:, 48:] = 255.0
    se = np.asarray(detect.dog_score_map(jnp.asarray(edge), jnp.float32(5.0)))
    assert se[10:86, 40:56].max() == 0.0 or (
        se[10:86, 40:56].max() < s[21:28, 21:28].max() * 0.5
    )


def test_tracker_runs_with_dog(image):
    """Full tracking loop with the SIFT-class scale-space detector."""
    from vslam_tpu.tracking.tracker import PoseTracker
    from vslam_tpu.eval import trajectory as traj_eval

    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.framepoint_generation.detector_type = "DOG"
    cfg.framepoint_generation.detector_threshold_starting_value = 8.0
    tracker = PoseTracker(CAM, cfg, landmark_capacity=8192)
    world2 = synthetic.make_world(CAM, n_frames=8, n_points=2000, seed=6, step=0.3)
    for t in range(8):
        l, r, _ = synthetic.render_frame(world2, t)
        tracker.compute(l, r)
    est = np.stack(tracker.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world2.poses)
    assert tracker.stats.n_breaks == 0
    assert rmse < 0.15, rmse


# ---------------------------------------------------------------------------
# KAZE nonlinear-scale-space detector (reference cv::KAZE/AKAZE wrappers,
# base_framepoint_generator.cpp:28-49,73-91)
# ---------------------------------------------------------------------------


def test_fed_linear_limit_matches_gaussian():
    """With conductivity forced to 1 the FED evolution integrates the
    linear heat equation: evolving to time T must match a Gaussian blur of
    sigma = sqrt(2T) (the correctness anchor for the integrator)."""
    rng = np.random.default_rng(3)
    # Band-limited input: the 5-point Laplacian only approximates the
    # continuous heat kernel below the grid Nyquist, so white noise would
    # compare discretization error, not integrator correctness.
    img = np.asarray(
        detect.gauss_blur(
            jnp.asarray(rng.uniform(0, 1, (64, 96)).astype(np.float32)), 3.0
        )
    )
    T = 4.5  # sigma = 3.0
    n = detect._fed_steps_for_time(T)
    taus = detect._fed_tau_ladder(n)
    # Rescale the ladder so total time is exactly T.
    taus = taus * (T / float(taus.sum()))
    L = jnp.asarray(img)
    g = jnp.ones_like(L)
    for tau in taus:
        L = detect._diffusion_substep(L, g, float(tau))
    # Oracle 1 (tight): the exact DISCRETE heat evolution — many small
    # stable explicit steps to the same total time.  Pins the FED cycle's
    # correctness independent of spatial discretization error.
    Ls = jnp.asarray(img)
    n_small = int(np.ceil(T / 0.2))
    for _ in range(n_small):
        Ls = detect._diffusion_substep(Ls, g, T / n_small)
    a = np.asarray(L)[8:-8, 8:-8]
    b = np.asarray(Ls)[8:-8, 8:-8]
    # (FED is by design an approximation of the heat kernel whose transfer
    # function deviates at high frequencies; the band-limited input keeps
    # the comparison in the regime both integrators resolve.)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    assert np.abs(a - b).mean() < 5e-3
    # Oracle 2 (loose): the continuous limit — Gaussian of sqrt(2T).
    ref = np.asarray(detect.gauss_blur(jnp.asarray(img), 3.0))[8:-8, 8:-8]
    assert np.corrcoef(a.ravel(), ref.ravel())[0, 1] > 0.9


def test_kaze_corner_vs_edge():
    """Hessian-determinant response fires on blob/corner structure, not on
    straight step edges (det H ~ 0 on a 1D edge)."""
    img = np.zeros((96, 96), np.float32)
    img[:, 48:] = 200.0  # vertical step edge
    img[20:32, 20:32] = 255.0  # square blob
    s = np.asarray(detect.kaze_score_map(jnp.asarray(img), jnp.float32(1.0)))
    blob = s[14:38, 14:38].max()
    edge_band = s[50:90, 44:52].max()
    assert blob > 0
    assert blob > 5.0 * max(edge_band, 1e-6)


def test_kaze_detect_keypoints_end_to_end():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 10, (128, 160)).astype(np.float32)
    # Gaussian blobs (det-Hessian extrema sit at blob centers; a uniform
    # square would score at its four corners instead).
    yy, xx = np.mgrid[0:128, 0:160].astype(np.float32)
    for r, c in [(30, 40), (60, 100), (90, 60)]:
        img += 220.0 * np.exp(-((yy - r) ** 2 + (xx - c) ** 2) / (2 * 3.0**2))
    kp = detect.detect_keypoints(jnp.asarray(img), jnp.float32(2.0),
                                 bin_size=16, capacity=64, border=16,
                                 detector="KAZE")
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert len(uv) >= 3
    for r, c in [(30, 40), (60, 100), (90, 60)]:
        d = np.linalg.norm(uv - np.array([c, r]), axis=1).min()
        assert d < 4.0, (r, c, d)
