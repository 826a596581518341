"""SE(3)/SO(3) oracle tests against scipy.spatial.transform."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from vslam_tpu.ops import lie

RNG = np.random.default_rng(0)


def random_rotvecs(n, scale=2.0):
    return (RNG.standard_normal((n, 3)) * scale).astype(np.float32)


def test_exp_so3_matches_scipy():
    w = random_rotvecs(64)
    ours = np.asarray(lie.exp_so3(jnp.asarray(w)))
    oracle = Rsc.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_log_so3_roundtrip():
    w = random_rotvecs(64, scale=1.0)
    # Rotation vectors with norm > pi cannot round-trip (log returns the
    # canonical representative); compare through the rotation instead.
    R = lie.exp_so3(jnp.asarray(w))
    w_back = lie.log_so3(R)
    R_back = np.asarray(lie.exp_so3(w_back))
    np.testing.assert_allclose(R_back, np.asarray(R), atol=1e-4)
    small = np.linalg.norm(w, axis=1) < 3.0
    np.testing.assert_allclose(np.asarray(w_back)[small], w[small], atol=1e-4)


def test_log_so3_near_pi():
    # The quaternion route must stay stable close to theta = pi.
    axis = np.array([[0.3, -0.5, 0.8]], np.float32)
    axis /= np.linalg.norm(axis)
    w = axis * (np.pi - 1e-4)
    R = lie.exp_so3(jnp.asarray(w.astype(np.float32)))
    w_back = np.asarray(lie.log_so3(R))
    np.testing.assert_allclose(w_back, w, atol=1e-3)


def test_exp_log_se3_roundtrip():
    xi = (RNG.standard_normal((32, 6)) * 0.8).astype(np.float32)
    # Keep rotation part below pi so the twist round-trips uniquely.
    wn = np.linalg.norm(xi[:, 3:], axis=1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 2.8 / np.maximum(wn, 1e-9))
    T = lie.exp_se3(jnp.asarray(xi))
    xi_back = np.asarray(lie.log_se3(T))
    np.testing.assert_allclose(xi_back, xi, atol=1e-4)
    # Bottom row exact
    np.testing.assert_array_equal(np.asarray(T)[:, 3, :], np.tile([0, 0, 0, 1], (32, 1)))


def test_exp_se3_zero_is_identity():
    T = np.asarray(lie.exp_se3(jnp.zeros(6)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-7)


def test_inverse():
    xi = (RNG.standard_normal((8, 6)) * 0.5).astype(np.float32)
    T = lie.exp_se3(jnp.asarray(xi))
    eye = np.asarray(jnp.einsum("nij,njk->nik", T, lie.inverse(T)))
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_transform_points():
    xi = (RNG.standard_normal(6) * 0.5).astype(np.float32)
    T = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    pts = RNG.standard_normal((100, 3)).astype(np.float32)
    ours = np.asarray(lie.transform_point_cloud(jnp.asarray(T), jnp.asarray(pts)))
    oracle = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_orthonormalize_projects_to_so3():
    R = Rsc.random(16, random_state=3).as_matrix().astype(np.float32)
    noisy = R + RNG.standard_normal(R.shape).astype(np.float32) * 0.01
    fixed = np.asarray(lie.orthonormalize(jnp.asarray(noisy)))
    eye = np.einsum("nij,nkj->nik", fixed, fixed)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    assert np.all(np.linalg.det(fixed) > 0.99)
    # Stays close to the original rotation
    assert np.max(np.abs(fixed - R)) < 0.05


def test_quat_roundtrip():
    R = Rsc.random(32, random_state=7).as_matrix().astype(np.float32)
    q = lie.rot_to_quat(jnp.asarray(R))
    R_back = np.asarray(lie.quat_to_rot(q))
    np.testing.assert_allclose(R_back, R, atol=1e-5)
    # scipy cross-check (scipy uses x,y,z,w order)
    q_sc = Rsc.from_matrix(R).as_quat()
    q_sc = np.concatenate([q_sc[:, 3:], q_sc[:, :3]], axis=1)
    q_sc *= np.where(q_sc[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(q), q_sc, atol=1e-5)


def test_rotation_angle():
    for ang in [0.0, 0.1, 1.5, 3.0]:
        w = np.array([0.0, ang, 0.0], np.float32)
        R = lie.exp_so3(jnp.asarray(w))
        assert abs(float(lie.rotation_angle(R)) - ang) < 1e-4


def test_adjoint_identity():
    """T exp(xi) T^-1 == exp(Ad_T xi) — large translation lever arm."""
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(lie.exp_so3(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
    T[:3, 3] = [10.0, -5.0, 65.0]
    for scale in (0.01, 0.2):
        xi = jnp.asarray((RNG.standard_normal(6) * scale).astype(np.float32))
        lhs = jnp.asarray(T) @ lie.exp_se3(xi) @ lie.inverse(jnp.asarray(T))
        rhs = lie.exp_se3(lie.adjoint_se3(jnp.asarray(T)) @ xi)
        assert float(jnp.abs(lhs - rhs).max()) < 1e-4


def test_jl_inv_se3_matches_autodiff():
    """Closed-form inverse left Jacobian == jacfwd of log(exp(d) exp(xi))
    across the whole usable rotation range (the pose-graph edge
    linearization, backend/pose_graph.py)."""
    import jax

    for scale in (1e-3, 0.1, 1.0, 2.5):
        for trial in range(3):
            xi_np = (RNG.standard_normal(6) * scale).astype(np.float32)
            if np.linalg.norm(xi_np[3:]) > np.pi - 0.1:
                xi_np[3:] *= (np.pi - 0.2) / np.linalg.norm(xi_np[3:])
            xi = jnp.asarray(xi_np)

            def f(d):
                return lie.log_se3(lie.exp_se3(d) @ lie.exp_se3(xi))

            J_num = jax.jacfwd(f)(jnp.zeros(6, jnp.float32))
            J_cf = lie.jl_inv_se3(xi)
            assert float(jnp.abs(J_num - J_cf).max()) < 2e-4, (scale, trial)
