"""FAST-ICP (Anderson-accelerated ICP) tests: exact recovery, robustness to
outliers, agreement with the GN ICP aligner, and faster energy descent than
the plain fixed-point iteration (the point of Anderson acceleration)."""

import numpy as np
import jax.numpy as jnp

from vslam_tpu.ops import lie
from vslam_tpu.solve import anderson, gn
from vslam_tpu.solve.aligners import ICPData, icp_align

RNG = np.random.default_rng(11)


def make_problem(n=120, noise=0.0, outliers=0):
    xi = np.array([0.4, -0.2, 0.3, 0.05, -0.08, 0.12], np.float32)
    T_true = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    p_mov = RNG.uniform(-5, 5, (n, 3)).astype(np.float32)
    p_fix = p_mov @ T_true[:3, :3].T + T_true[:3, 3]
    p_fix += RNG.normal(0, noise, p_fix.shape).astype(np.float32)
    if outliers:
        idx = RNG.choice(n, outliers, replace=False)
        p_fix[idx] += RNG.uniform(3, 8, (outliers, 3)).astype(np.float32)
    data = ICPData(
        p_moving=jnp.asarray(p_mov),
        p_fixed=jnp.asarray(p_fix),
        weight=jnp.ones(n, jnp.float32),
    )
    return data, T_true


def test_fast_icp_exact():
    data, T_true = make_problem()
    res = anderson.fast_icp_align(
        data, jnp.ones(data.p_moving.shape[0], bool), jnp.eye(4),
        gn.GNConfig(kernel_max_error=1.0, min_num_inliers=20),
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), T_true, atol=1e-4)


def test_fast_icp_robust_to_outliers():
    data, T_true = make_problem(noise=0.01, outliers=25)
    res = anderson.fast_icp_align(
        data, jnp.ones(data.p_moving.shape[0], bool), jnp.eye(4),
        gn.GNConfig(kernel_max_error=0.5, min_num_inliers=20),
    )
    assert bool(res.converged)
    err = np.linalg.norm(np.asarray(res.x)[:3, 3] - T_true[:3, 3])
    assert err < 0.02, err
    assert int(res.num_inliers) >= 90


def test_fast_icp_matches_gn_icp():
    data, T_true = make_problem(noise=0.005)
    cfg = gn.GNConfig(kernel_max_error=0.5, min_num_inliers=20)
    mask = jnp.ones(data.p_moving.shape[0], bool)
    r_aa = anderson.fast_icp_align(data, mask, jnp.eye(4), cfg)
    r_gn = icp_align(data, mask, jnp.eye(4), cfg)
    d = np.linalg.norm(np.asarray(r_aa.x)[:3, 3] - np.asarray(r_gn.x)[:3, 3])
    assert d < 5e-3, d


def test_anderson_accelerates_descent():
    """With acceleration, few rounds reach the energy the plain iteration
    needs many rounds for (here: the plain map converges in one Procrustes
    for clean data, so use a robust-kernel problem where IRLS iterates)."""
    data, T_true = make_problem(noise=0.02, outliers=30)
    cfg = gn.GNConfig(kernel_max_error=0.3, min_num_inliers=20)
    mask = jnp.ones(data.p_moving.shape[0], bool)
    res5 = anderson.fast_icp_align(data, mask, jnp.eye(4), cfg, max_rounds=6)
    err = np.linalg.norm(np.asarray(res5.x)[:3, 3] - T_true[:3, 3])
    assert err < 0.05, err
