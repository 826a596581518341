"""Pinhole stereo/RGB-D camera model and triangulation kernels.

Replaces reference src/types/camera.h:19-99 (pinhole model, FoV check) plus
the triangulation routines: disparity triangulation
(src/framepoint_generation/stereo_framepoint_generator.cpp:871-895) and
2-view midpoint triangulation from motion
(src/framepoint_generation/base_framepoint_generator.cpp:461-494).

All functions are batched over a leading point dimension; the camera is a
small static pytree closed over inside jitted callers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class CameraParams(NamedTuple):
    """Static per-run camera intrinsics + stereo geometry.

    K: (3, 3) intrinsics. baseline_m: stereo baseline in meters (so the
    right-image column is u_r = u_l - fx * baseline / z, matching the
    reference's homogeneous `baseline_pixelsmeters` convention with
    b_x = -fx * baseline, camera.h:46-51). rows/cols: image size.

    Registered as a custom pytree: rows/cols/depth_scale are STATIC aux
    data (usable as array shapes inside jit; jit specializes per camera
    geometry), K/baseline/extrinsics are traced leaves.
    """

    K: jnp.ndarray
    baseline_m: jnp.ndarray
    rows: int
    cols: int
    T_cam_robot: jnp.ndarray  # (4,4) robot -> camera
    depth_scale: float = 1e-3  # 16-bit depth -> meters (parameters.h:251)

    def tree_flatten(self):
        return (self.K, self.baseline_m, self.T_cam_robot), (
            self.rows,
            self.cols,
            self.depth_scale,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        K, baseline_m, T_cam_robot = leaves
        rows, cols, depth_scale = aux
        return cls(K, baseline_m, rows, cols, T_cam_robot, depth_scale)

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    @property
    def K_inv(self):
        return jnp.linalg.inv(self.K)

    @property
    def T_robot_cam(self):
        from vslam_tpu.ops import lie

        return lie.inverse(self.T_cam_robot)


def make_camera(
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    baseline_m: float,
    rows: int,
    cols: int,
    T_cam_robot=None,
) -> CameraParams:
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
    if T_cam_robot is None:
        T_cam_robot = jnp.eye(4, dtype=jnp.float32)
    return CameraParams(
        K=K,
        baseline_m=jnp.float32(baseline_m),
        rows=int(rows),
        cols=int(cols),
        T_cam_robot=jnp.asarray(T_cam_robot, jnp.float32),
    )


def project(cam: CameraParams, p_cam: jnp.ndarray, eps: float = 1e-6):
    """Project camera-frame points (N, 3) -> pixel (u, v) (N, 2), plus depth.

    Returns (uv, z). Points behind the camera keep a tiny positive z so the
    division is finite; callers must mask on the returned z.
    """
    z = p_cam[..., 2]
    z_safe = jnp.maximum(z, eps)
    u = cam.fx * p_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * p_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(cam: CameraParams, p_cam: jnp.ndarray, eps: float = 1e-6):
    """Project into both rectified cameras.

    Returns (uv_left (N,2), uv_right (N,2), z (N,)).  Right differs only in
    u by the disparity fx*b/z (rectified stereo).
    """
    uv_l, z = project(cam, p_cam, eps)
    disp = cam.fx * cam.baseline_m / jnp.maximum(z, eps)
    uv_r = uv_l.at[..., 0].add(-disp)
    return uv_l, uv_r, z


def in_field_of_view(cam: CameraParams, uv: jnp.ndarray, z: jnp.ndarray, border: float = 0.0):
    """Visibility mask, reference camera.cpp:29-42."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (z > 0.0)
        & (u >= border)
        & (u < cam.cols - border)
        & (v >= border)
        & (v < cam.rows - border)
    )


def back_project(cam: CameraParams, uv: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Pixel + depth -> camera-frame 3D point (N, 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def triangulate_disparity(
    cam: CameraParams,
    uv_left: jnp.ndarray,
    uv_right: jnp.ndarray,
    min_disparity: float = 1.0,
):
    """Rectified-stereo triangulation (N,2),(N,2) -> ((N,3) points, valid mask).

    z = fx * b / disparity; x,y from the left ray. Mirrors the reference's
    getPointInLeftCamera (stereo_framepoint_generator.cpp:871-895) including
    its minimum-disparity gate.
    """
    disp = uv_left[..., 0] - uv_right[..., 0]
    valid = disp >= min_disparity
    disp_safe = jnp.maximum(disp, min_disparity)
    z = cam.fx * cam.baseline_m / disp_safe
    p = back_project(cam, uv_left, z)
    return p, valid


def triangulate_midpoint(
    cam: CameraParams,
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    T_a_b: jnp.ndarray,
    max_depth: float = 1e3,
):
    """Two-view midpoint triangulation from motion, batched over N.

    Rays: r_a in camera A through uv_a; r_b in camera B through uv_b, with
    T_a_b mapping B-frame points into A. Solves the 2x2 normal equations for
    the closest-approach parameters and returns the midpoint in camera A,
    plus a validity mask (parallax + positive depth). Reference:
    base_framepoint_generator.cpp:461-494 (SVD midpoint); here we use the
    closed-form 2x2 solve, which is the same least-squares midpoint.
    """
    K_inv = cam.K_inv
    ones = jnp.ones(uv_a.shape[:-1] + (1,), uv_a.dtype)
    da = jnp.concatenate([uv_a, ones], axis=-1) @ K_inv.T  # ray dirs in A
    db_local = jnp.concatenate([uv_b, ones], axis=-1) @ K_inv.T
    R = T_a_b[:3, :3]
    t = T_a_b[:3, 3]
    db = db_local @ R.T  # B rays expressed in A frame
    o_b = t  # B center in A frame

    # min ||o_b + s*db - u*da||: normal equations in (u, s).  The
    # determinant aa*bb - ab^2 cancels catastrophically in f32 for
    # nearly-parallel rays; |da x db|^2 is the same quantity, computed
    # stably.
    aa = jnp.sum(da * da, axis=-1)
    bb = jnp.sum(db * db, axis=-1)
    ab = jnp.sum(da * db, axis=-1)
    at = jnp.sum(da * o_b, axis=-1)
    bt = jnp.sum(db * o_b, axis=-1)
    cross = jnp.cross(da, db)
    det = jnp.sum(cross * cross, axis=-1)
    parallax_ok = det > 1e-6 * aa * bb
    det_safe = jnp.where(parallax_ok, det, 1.0)
    u = (bb * at - ab * bt) / det_safe
    s = (ab * at - aa * bt) / det_safe
    p_a = u[..., None] * da
    p_b = o_b + s[..., None] * db
    mid = 0.5 * (p_a + p_b)
    valid = parallax_ok & (u > 0) & (s > 0) & (mid[..., 2] > 0) & (mid[..., 2] < max_depth)
    return mid, valid
