"""GN engine + aligner tests on synthetic SE(3) recovery problems
(the reference has no unit tests; this is the oracle strategy from
SURVEY.md §4: recover known poses from projected points + noise/outliers)."""

import jax
import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import camera as cam_ops, lie
from vslam_tpu.solve import gn, aligners

RNG = np.random.default_rng(3)
CAM = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                          baseline_m=0.5372, rows=376, cols=1241)
N = 256


def make_stereo_problem(noise_px=0.0, outlier_frac=0.0, xi_scale=None):
    z = RNG.uniform(4.0, 40.0, N)
    u = RNG.uniform(100, CAM.cols - 100, N)
    v = RNG.uniform(40, CAM.rows - 40, N)
    x = (u - 607.19) / 718.856 * z
    y = (v - 185.22) / 718.856 * z
    p_prev = np.stack([x, y, z], 1).astype(np.float32)
    if xi_scale is None:
        xi_scale = np.array([0.3, 0.1, 0.5, 0.02, 0.04, 0.01])
    xi_true = (RNG.standard_normal(6) * xi_scale).astype(np.float32)
    T_true = lie.exp_se3(jnp.asarray(xi_true))  # cur <- prev
    p_cur = lie.transform_point_cloud(T_true, jnp.asarray(p_prev))
    uv_l, uv_r, _ = cam_ops.project_stereo(CAM, p_cur)
    meas = np.concatenate([np.asarray(uv_l), np.asarray(uv_r)], 1)
    meas += RNG.standard_normal(meas.shape).astype(np.float32) * noise_px
    n_out = int(outlier_frac * N)
    if n_out:
        idx = RNG.choice(N, n_out, replace=False)
        meas[idx] += RNG.uniform(30, 120, (n_out, 4)) * RNG.choice([-1, 1], (n_out, 4))
    data = aligners.StereoUVData(
        p_prev=jnp.asarray(p_prev),
        meas=jnp.asarray(meas.astype(np.float32)),
        weight=jnp.ones(N, jnp.float32),
    )
    return data, np.asarray(T_true)


def pose_error(T_est, T_true):
    dT = np.asarray(lie.log_se3(jnp.asarray(T_est @ np.linalg.inv(T_true), dtype=jnp.float32)))
    return np.linalg.norm(dT[:3]), np.linalg.norm(dT[3:])


def test_stereo_uv_exact_recovery():
    data, T_true = make_stereo_problem()
    res = aligners.stereo_uv_align(CAM, data, jnp.ones(N, bool), jnp.eye(4))
    t_err, r_err = pose_error(np.asarray(res.x), T_true)
    assert bool(res.converged)
    # f32 fixed-point plateau: ~1e-3 m / ~1e-3 rad is exact recovery here
    assert t_err < 2e-3 and r_err < 1e-3
    assert int(res.num_inliers) == N


def test_stereo_uv_noise():
    data, T_true = make_stereo_problem(noise_px=0.5)
    res = aligners.stereo_uv_align(CAM, data, jnp.ones(N, bool), jnp.eye(4))
    t_err, r_err = pose_error(np.asarray(res.x), T_true)
    assert t_err < 0.02 and r_err < 2e-3


def test_stereo_uv_outliers_robust():
    data, T_true = make_stereo_problem(noise_px=0.3, outlier_frac=0.25)
    res = aligners.stereo_uv_align(CAM, data, jnp.ones(N, bool), jnp.eye(4))
    t_err, r_err = pose_error(np.asarray(res.x), T_true)
    assert t_err < 0.03 and r_err < 3e-3
    # Robust kernel should have rejected most outliers
    assert int(res.num_inliers) < N
    assert int(res.num_inliers) > 0.6 * N


def test_stereo_uv_respects_mask():
    data, T_true = make_stereo_problem()
    # Corrupt half the measurements but mask them out.
    meas = np.asarray(data.meas).copy()
    meas[: N // 2] += 500.0
    mask = np.ones(N, bool)
    mask[: N // 2] = False
    data = data._replace(meas=jnp.asarray(meas))
    res = aligners.stereo_uv_align(CAM, data, jnp.asarray(mask), jnp.eye(4))
    t_err, _ = pose_error(np.asarray(res.x), T_true)
    assert t_err < 1e-2
    assert int(res.num_inliers) <= N // 2


def test_icp_recovery():
    p_moving = RNG.uniform(-10, 10, (128, 3)).astype(np.float32)
    xi = np.array([1.0, -0.5, 0.8, 0.2, -0.1, 0.3], np.float32)
    T_true = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    p_fixed = p_moving @ T_true[:3, :3].T + T_true[:3, 3]
    data = aligners.ICPData(
        p_moving=jnp.asarray(p_moving),
        p_fixed=jnp.asarray(p_fixed),
        weight=jnp.ones(128, jnp.float32),
    )
    res = aligners.icp_align(data, jnp.ones(128, bool), jnp.eye(4),
                             gn.GNConfig(kernel_max_error=1.0))
    t_err, r_err = pose_error(np.asarray(res.x), T_true)
    assert t_err < 2e-3 and r_err < 1e-3


def test_icp_with_outlier_correspondences():
    p_moving = RNG.uniform(-10, 10, (128, 3)).astype(np.float32)
    xi = np.array([0.5, 0.2, -0.3, 0.05, 0.1, -0.08], np.float32)
    T_true = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    p_fixed = p_moving @ T_true[:3, :3].T + T_true[:3, 3]
    p_fixed[:20] += RNG.uniform(3, 8, (20, 3))  # bad correspondences
    data = aligners.ICPData(
        p_moving=jnp.asarray(p_moving),
        p_fixed=jnp.asarray(p_fixed.astype(np.float32)),
        weight=jnp.ones(128, jnp.float32),
    )
    res = aligners.icp_align(data, jnp.ones(128, bool), jnp.eye(4),
                             gn.GNConfig(kernel_max_error=0.25))
    t_err, r_err = pose_error(np.asarray(res.x), T_true)
    assert t_err < 0.05 and r_err < 5e-3


def test_uvd_recovery():
    z = RNG.uniform(1.0, 8.0, N)
    u = RNG.uniform(60, 580, N)
    v = RNG.uniform(40, 440, N)
    cam = cam_ops.make_camera(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                              baseline_m=0.075, rows=480, cols=640)
    x = (u - 319.5) / 525.0 * z
    y = (v - 239.5) / 525.0 * z
    p_prev = np.stack([x, y, z], 1).astype(np.float32)
    xi_true = np.array([0.05, -0.03, 0.1, 0.02, 0.01, -0.015], np.float32)
    T_true = np.asarray(lie.exp_se3(jnp.asarray(xi_true)))
    p_cur = p_prev @ T_true[:3, :3].T + T_true[:3, 3]
    uv, zc = cam_ops.project(cam, jnp.asarray(p_cur.astype(np.float32)))
    meas = np.concatenate([np.asarray(uv), np.asarray(zc)[:, None]], 1)
    data = aligners.UVDData(
        p_prev=jnp.asarray(p_prev),
        meas=jnp.asarray(meas.astype(np.float32)),
        weight=jnp.ones(N, jnp.float32),
        depth_reliable=jnp.ones(N, bool),
    )
    res = aligners.uvd_align(cam, data, jnp.ones(N, bool), jnp.eye(4))
    t_err, r_err = pose_error(np.asarray(res.x), T_true)
    assert t_err < 3e-3 and r_err < 1e-3


def test_landmark_update_converges_over_frames():
    # A landmark observed from several poses must converge toward truth
    # when initialized with a biased estimate.
    M = 64
    xyz_true = np.stack([
        RNG.uniform(-10, 10, M), RNG.uniform(-3, 3, M), RNG.uniform(8, 30, M)
    ], 1).astype(np.float32)
    xyz_est = jnp.asarray(xyz_true + RNG.standard_normal((M, 3)).astype(np.float32) * 0.5)
    H = jnp.zeros((M, 3, 3), jnp.float32)
    for k in range(8):
        xi = np.array([0.3 * k, 0.0, 0.1 * k, 0.0, 0.02 * k, 0.0], np.float32)
        T_wc = lie.exp_se3(jnp.asarray(xi))  # camera pose in world
        p_cam = lie.transform_point_cloud(lie.inverse(T_wc), jnp.asarray(xyz_true))
        uv_l, uv_r, _ = cam_ops.project_stereo(CAM, p_cam)
        meas = jnp.concatenate([uv_l, uv_r], 1)
        xyz_est, H, chi2, inl = aligners.update_landmarks(
            CAM, xyz_est, H, T_wc, meas, jnp.ones(M, bool))
    err = np.linalg.norm(np.asarray(xyz_est) - xyz_true, axis=1)
    assert np.median(err) < 0.05


def test_landmark_update_ignores_unobserved():
    M = 8
    xyz = jnp.asarray(RNG.uniform(-5, 5, (M, 3)).astype(np.float32) + np.array([0, 0, 15], np.float32))
    H = jnp.zeros((M, 3, 3), jnp.float32)
    meas = jnp.zeros((M, 4), jnp.float32)  # garbage measurements
    mask = jnp.zeros(M, bool)
    xyz_new, H_new, _, inl = aligners.update_landmarks(CAM, xyz, H, jnp.eye(4), meas, mask)
    np.testing.assert_array_equal(np.asarray(xyz_new), np.asarray(xyz))
    assert not np.any(np.asarray(inl))


def test_fast_stereo_aligner_matches_generic():
    """stereo_uv_align_fast (analytic Jacobian, lean loops) must agree
    with the generic autodiff engine on the same robust problem."""
    rng = np.random.default_rng(2)
    N = 512
    p_prev = np.stack([rng.uniform(-4, 4, N), rng.uniform(-2, 2, N),
                       rng.uniform(4, 25, N)], 1).astype(np.float32)
    xi = np.array([0.05, -0.02, 0.3, 0.01, -0.02, 0.015], np.float32)
    T_true = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    p_cur = (T_true[:3, :3] @ p_prev.T).T + T_true[:3, 3]
    uv_l, uv_r, _ = cam_ops.project_stereo(CAM, jnp.asarray(p_cur))
    meas = np.concatenate([np.asarray(uv_l), np.asarray(uv_r)], 1)
    meas += rng.normal(0, 0.2, meas.shape).astype(np.float32)
    out_idx = rng.choice(N, 40, replace=False)
    meas[out_idx] += rng.normal(0, 40, (40, 4)).astype(np.float32)
    mask = np.ones(N, bool)
    mask[-30:] = False
    data = aligners.StereoUVData(
        p_prev=jnp.asarray(p_prev), meas=jnp.asarray(meas),
        weight=jnp.ones(N, jnp.float32))
    cfg = gn.GNConfig()
    T0 = jnp.eye(4)

    # Analytic Jacobian equals the autodiff Jacobian.
    residual_fn, _ = aligners.make_stereo_uv_residual(CAM)
    r_ad, J_ad = jax.vmap(residual_fn, in_axes=(None, 0))(T0, data)
    r_an, J_an, _ = aligners._stereo_r_J_analytic(
        CAM, data.p_prev, data.meas)
    assert float(jnp.abs(r_ad - r_an).max()) < 1e-3
    assert float(jnp.abs(J_ad - J_an).max()) < 1e-2

    res_gen = aligners.stereo_uv_align(CAM, data, jnp.asarray(mask), T0, cfg)
    res_fast = aligners.stereo_uv_align_fast(
        CAM, data, jnp.asarray(mask), T0, cfg)
    assert np.abs(np.asarray(res_fast.x) - T_true).max() < 2e-3
    assert np.abs(
        np.asarray(res_fast.x) - np.asarray(res_gen.x)
    ).max() < 1e-4
    assert abs(int(res_fast.num_inliers) - int(res_gen.num_inliers)) <= 5
