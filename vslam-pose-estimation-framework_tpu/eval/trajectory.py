"""Trajectory evaluation: ATE / RPE with rigid alignment.

Parity with the reference's offline metric tool
(executables/trajectory_analyzer.cpp): raw ATE RMSE (:207) and the
"optimal" RMSE after 6-DoF alignment (:222-284, which runs 100 GN ICP
iterations).  Here alignment is the closed-form Umeyama solution — the
exact minimizer of the same point-to-point objective, so "optimal RMSE"
is truly optimal rather than iteratively approximated.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (+scale) transform aligning x onto y.

    x, y: (N, 3).  Returns (R, t, s) with y ~ s * R @ x + t.
    """
    mu_x = x.mean(0)
    mu_y = y.mean(0)
    xc = x - mu_x
    yc = y - mu_y
    cov = yc.T @ xc / len(x)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc**2).sum() / len(x)
        s = float(np.trace(np.diag(d) @ S) / var_x)
    else:
        s = 1.0
    t = mu_y - s * R @ mu_x
    return R, t, s


def ate_rmse(
    estimate: np.ndarray, ground_truth: np.ndarray, align: bool = True,
    with_scale: bool = False,
):
    """Absolute trajectory error RMSE over (T, 4, 4) or (T, 3) inputs.

    Returns (rmse, aligned_positions, raw_rmse).
    """
    p_est = estimate[:, :3, 3] if estimate.ndim == 3 else estimate
    p_gt = ground_truth[:, :3, 3] if ground_truth.ndim == 3 else ground_truth
    assert p_est.shape == p_gt.shape
    raw = float(np.sqrt(np.mean(np.sum((p_est - p_gt) ** 2, axis=1))))
    if not align:
        return raw, p_est, raw
    R, t, s = umeyama_alignment(p_est, p_gt, with_scale)
    p_al = (s * (R @ p_est.T)).T + t
    rmse = float(np.sqrt(np.mean(np.sum((p_al - p_gt) ** 2, axis=1))))
    return rmse, p_al, raw


def rpe(estimate: np.ndarray, ground_truth: np.ndarray, delta: int = 1):
    """Relative pose error over pose arrays (T, 4, 4).

    Returns (trans_rmse_per_step, rot_rmse_rad_per_step).
    """
    assert estimate.ndim == 3 and ground_truth.ndim == 3
    t_errs, r_errs = [], []
    for i in range(len(estimate) - delta):
        dE = np.linalg.inv(estimate[i]) @ estimate[i + delta]
        dG = np.linalg.inv(ground_truth[i]) @ ground_truth[i + delta]
        E = np.linalg.inv(dG) @ dE
        t_errs.append(np.linalg.norm(E[:3, 3]))
        c = np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)
        r_errs.append(np.arccos(c))
    return float(np.sqrt(np.mean(np.square(t_errs)))), float(
        np.sqrt(np.mean(np.square(r_errs)))
    )


# ---------------------------------------------------------------------------
# Trajectory file formats (byte-compatible with the reference writers,
# world_map.cpp:184-258, so evo / trajectory_analyzer can consume them).
# ---------------------------------------------------------------------------


def write_kitti(path: str, poses: np.ndarray) -> None:
    """KITTI format: 12 floats per line, row-major 3x4."""
    with open(path, "w") as f:
        for T in poses:
            f.write(" ".join(f"{v:.9e}" for v in T[:3, :4].reshape(-1)) + "\n")


def read_kitti(path: str) -> np.ndarray:
    rows = np.loadtxt(path).reshape(-1, 3, 4)
    out = np.tile(np.eye(4, dtype=np.float64), (len(rows), 1, 1))
    out[:, :3, :4] = rows
    return out


def write_tum(path: str, poses: np.ndarray, timestamps=None) -> None:
    """TUM format: `ts tx ty tz qx qy qz qw` per line."""
    import jax.numpy as jnp

    from vslam_tpu.ops import lie

    if timestamps is None:
        timestamps = np.arange(len(poses), dtype=np.float64)
    q = np.asarray(lie.rot_to_quat(jnp.asarray(poses[:, :3, :3].astype(np.float32))))
    with open(path, "w") as f:
        for ts, T, (qw, qx, qy, qz) in zip(timestamps, poses, q):
            t = T[:3, 3]
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
            )


def read_tum(path: str):
    """Returns (timestamps (T,), poses (T, 4, 4))."""
    import jax.numpy as jnp

    from vslam_tpu.ops import lie

    data = np.loadtxt(path)
    ts = data[:, 0]
    t = data[:, 1:4]
    qxyzw = data[:, 4:8]
    q_wxyz = np.concatenate([qxyzw[:, 3:4], qxyzw[:, :3]], axis=1)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q_wxyz.astype(np.float32))))
    out = np.tile(np.eye(4, dtype=np.float64), (len(ts), 1, 1))
    out[:, :3, :3] = R
    out[:, :3, 3] = t
    return ts, out


def associate_timestamps(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-neighbour timestamp association (reference
    trajectory_analyzer.cpp:161-205).  Returns (idx_a, idx_b)."""
    ia, ib = [], []
    j = 0
    for i, ta in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - ta)))
        if abs(ts_b[j] - ta) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia), np.asarray(ib)
