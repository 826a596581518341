"""Trajectory evaluation oracle tests."""

import os

import numpy as np
import jax.numpy as jnp

from vslam_tpu.eval import trajectory as T
from vslam_tpu.ops import lie

RNG = np.random.default_rng(8)


def random_traj(n=50):
    poses = [np.eye(4)]
    for _ in range(n - 1):
        xi = np.concatenate([RNG.normal(0, 0.3, 3), RNG.normal(0, 0.05, 3)]).astype(np.float32)
        poses.append(poses[-1] @ np.asarray(lie.exp_se3(jnp.asarray(xi)), dtype=np.float64))
    return np.stack(poses)


def test_umeyama_recovers_transform():
    x = RNG.normal(0, 5, (100, 3))
    R_true = np.asarray(lie.exp_so3(jnp.asarray(np.array([0.3, -0.2, 0.5], np.float32))), np.float64)
    t_true = np.array([1.0, -2.0, 3.0])
    y = x @ R_true.T + t_true
    R, t, s = T.umeyama_alignment(x, y)
    np.testing.assert_allclose(R, R_true, atol=1e-5)
    np.testing.assert_allclose(t, t_true, atol=1e-5)
    assert abs(s - 1.0) < 1e-9


def test_ate_zero_for_identical():
    traj = random_traj()
    rmse, _, raw = T.ate_rmse(traj, traj)
    assert rmse < 1e-9 and raw < 1e-9


def test_ate_invariant_to_rigid_offset():
    traj = random_traj()
    offset = np.eye(4)
    offset[:3, :3] = np.asarray(lie.exp_so3(jnp.asarray(np.array([0.1, 0.9, -0.4], np.float32))))
    offset[:3, 3] = [10, -5, 2]
    moved = np.einsum("ij,njk->nik", offset, traj)
    rmse, _, raw = T.ate_rmse(moved, traj)
    assert raw > 1.0  # raw error sees the offset
    assert rmse < 1e-4  # aligned error does not


def test_rpe_identity():
    traj = random_traj()
    t_rmse, r_rmse = T.rpe(traj, traj)
    assert t_rmse < 1e-9 and r_rmse < 1e-3


def test_kitti_roundtrip(tmp_path):
    traj = random_traj(20)
    p = str(tmp_path / "kitti.txt")
    T.write_kitti(p, traj)
    back = T.read_kitti(p)
    np.testing.assert_allclose(back, traj, atol=1e-7)


def test_tum_roundtrip(tmp_path):
    traj = random_traj(20)
    p = str(tmp_path / "tum.txt")
    T.write_tum(p, traj)
    ts, back = T.read_tum(p)
    np.testing.assert_allclose(back[:, :3, 3], traj[:, :3, 3], atol=1e-5)
    np.testing.assert_allclose(back[:, :3, :3], traj[:, :3, :3], atol=1e-4)


def test_associate_timestamps():
    ts_a = np.array([0.0, 0.1, 0.2, 0.35])
    ts_b = np.array([0.001, 0.105, 0.3])
    ia, ib = T.associate_timestamps(ts_a, ts_b, max_dt=0.02)
    assert ia.tolist() == [0, 1]
    assert ib.tolist() == [0, 1]
