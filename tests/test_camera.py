"""Camera projection / triangulation oracle tests."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.ops import lie

RNG = np.random.default_rng(1)

# KITTI-like camera
CAM = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                          baseline_m=0.5372, rows=376, cols=1241)


def random_points(n, zmin=2.0, zmax=50.0):
    z = RNG.uniform(zmin, zmax, n)
    u = RNG.uniform(50, CAM.cols - 50, n)
    v = RNG.uniform(20, CAM.rows - 20, n)
    x = (u - 607.19) / 718.856 * z
    y = (v - 185.22) / 718.856 * z
    return np.stack([x, y, z], 1).astype(np.float32)


def test_project_backproject_roundtrip():
    p = random_points(256)
    uv, z = cam_ops.project(CAM, jnp.asarray(p))
    p_back = np.asarray(cam_ops.back_project(CAM, uv, z))
    np.testing.assert_allclose(p_back, p, rtol=1e-4, atol=1e-3)


def test_project_matrix_oracle():
    p = random_points(64)
    uv, _ = cam_ops.project(CAM, jnp.asarray(p))
    K = np.asarray(CAM.K)
    hom = p @ K.T
    oracle = hom[:, :2] / hom[:, 2:3]
    np.testing.assert_allclose(np.asarray(uv), oracle, rtol=1e-4, atol=1e-2)


def test_stereo_triangulation_roundtrip():
    p = random_points(256)
    uv_l, uv_r, z = cam_ops.project_stereo(CAM, jnp.asarray(p))
    # disparity positive, right image u smaller
    disp = np.asarray(uv_l)[:, 0] - np.asarray(uv_r)[:, 0]
    assert np.all(disp > 0)
    p_tri, valid = cam_ops.triangulate_disparity(CAM, uv_l, uv_r)
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(p_tri), p, rtol=1e-3, atol=1e-2)


def test_min_disparity_gate():
    # Very far point -> subpixel disparity -> must be flagged invalid
    p = np.array([[0.0, 0.0, 5000.0]], np.float32)
    uv_l, uv_r, _ = cam_ops.project_stereo(CAM, jnp.asarray(p))
    _, valid = cam_ops.triangulate_disparity(CAM, uv_l, uv_r, min_disparity=1.0)
    assert not bool(np.asarray(valid)[0])


def test_field_of_view():
    p = jnp.asarray(np.array([
        [0, 0, 10.0],        # center, visible
        [0, 0, -5.0],        # behind
        [100.0, 0, 1.0],     # far off to the side
    ], np.float32))
    uv, z = cam_ops.project(CAM, p)
    vis = np.asarray(cam_ops.in_field_of_view(CAM, uv, z))
    assert vis.tolist() == [True, False, False]


def test_midpoint_triangulation():
    # Camera B is translated right+forward and slightly rotated vs A.
    p_a = random_points(128, zmin=4.0, zmax=40.0)
    xi = np.array([0.8, 0.05, 0.4, 0.01, -0.02, 0.005], np.float32)
    T_a_b = lie.exp_se3(jnp.asarray(xi))  # B -> A
    T_b_a = lie.inverse(T_a_b)
    p_b = np.asarray(lie.transform_point_cloud(T_b_a, jnp.asarray(p_a)))
    uv_a, _ = cam_ops.project(CAM, jnp.asarray(p_a))
    uv_b, _ = cam_ops.project(CAM, jnp.asarray(p_b))
    p_tri, valid = cam_ops.triangulate_midpoint(CAM, uv_a, uv_b, T_a_b)
    assert np.mean(np.asarray(valid)) > 0.95
    err = np.linalg.norm(np.asarray(p_tri) - p_a, axis=1)
    assert np.median(err[np.asarray(valid)]) < 0.05


def test_midpoint_rejects_zero_parallax():
    # Identity motion -> rays parallel -> no triangulation.
    p = random_points(16)
    uv, _ = cam_ops.project(CAM, jnp.asarray(p))
    _, valid = cam_ops.triangulate_midpoint(CAM, uv, uv, jnp.eye(4))
    assert not np.any(np.asarray(valid))
