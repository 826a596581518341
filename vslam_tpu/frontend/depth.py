"""RGB-D front-end kernels.

Replaces DepthFramePointGenerator (src/framepoint_generation/
depth_framepoint_generator.cpp): the serial per-pixel depth-map
registration with z-buffering (:410-484) and per-feature depth assignment
(:46-164) become two batched programs — a scatter-min z-buffer reprojection
for misaligned depth sensors, and a gather at keypoint coordinates for the
registered case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vslam_tpu.ops import camera as cam_ops


@jax.jit
def gather_depth(depth_m: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Depth at keypoint pixels (nearest neighbour): (H,W), (K,2) -> (K,)."""
    H, W = depth_m.shape
    c = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    r = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    return depth_m[r, c]


@partial(jax.jit, static_argnames=("radius",))
def bilateral_filter_depth(
    depth_m: jnp.ndarray,
    radius: int = 2,
    sigma_space: float = 2.0,
    sigma_range_m: float = 0.1,
) -> jnp.ndarray:
    """Edge-preserving depth smoothing (reference cv::bilateralFilter
    option on the registered depth map, depth_framepoint_generator.cpp:
    415-421): a shifted-window weighted mean where weights fall off with
    pixel distance AND depth difference, so object boundaries stay sharp.
    Invalid pixels (depth 0) carry zero weight and stay 0."""
    H, W = depth_m.shape
    pad = jnp.pad(depth_m, radius)
    num = jnp.zeros_like(depth_m)
    den = jnp.zeros_like(depth_m)
    valid_c = depth_m > 0
    inv_2ss = 0.5 / (sigma_space * sigma_space)
    inv_2sr = 0.5 / (sigma_range_m * sigma_range_m)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            nb = jax.lax.dynamic_slice(
                pad, (radius + dr, radius + dc), (H, W)
            )
            w = jnp.exp(
                -(dr * dr + dc * dc) * inv_2ss
                - (nb - depth_m) ** 2 * inv_2sr
            )
            w = jnp.where(nb > 0, w, 0.0)
            num = num + w * nb
            den = den + w
    out = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)
    return jnp.where(valid_c, out, 0.0)


@jax.jit
def register_depth(
    cam_rgb: cam_ops.CameraParams,
    depth_m: jnp.ndarray,  # (H, W) depth in the depth camera
    K_depth: jnp.ndarray,  # (3, 3) depth-camera intrinsics
    T_rgb_depth: jnp.ndarray,  # (4, 4) depth camera -> rgb camera
) -> jnp.ndarray:
    """Reproject a misaligned depth image into the RGB camera with
    z-buffering (reference _computeDepthMap,
    depth_framepoint_generator.cpp:410-484) — one scatter-min program.

    Returns (H, W) depth registered to the RGB frame; 0 where unknown.
    """
    H, W = depth_m.shape
    rows = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(-1)
    z = depth_m.reshape(-1)
    valid = z > 0

    K_inv = jnp.linalg.inv(K_depth)
    ones = jnp.ones_like(z)
    rays = jnp.stack([cols, rows, ones], axis=1) @ K_inv.T
    p_depth = rays * z[:, None]
    R = T_rgb_depth[:3, :3]
    t = T_rgb_depth[:3, 3]
    p_rgb = p_depth @ R.T + t

    uv, z_rgb = cam_ops.project(cam_rgb, p_rgb)
    c = jnp.round(uv[:, 0]).astype(jnp.int32)
    r = jnp.round(uv[:, 1]).astype(jnp.int32)
    inb = valid & (z_rgb > 0) & (c >= 0) & (c < cam_rgb.cols) & (r >= 0) & (r < cam_rgb.rows)
    flat = jnp.where(inb, r * cam_rgb.cols + c, 0)

    # z-buffer via scatter-min; sentinel inf -> 0 afterwards.
    out = jnp.full(cam_rgb.rows * cam_rgb.cols, jnp.inf, depth_m.dtype)
    out = out.at[flat].min(jnp.where(inb, z_rgb, jnp.inf))
    out = jnp.where(jnp.isinf(out), 0.0, out)
    return out.reshape(cam_rgb.rows, cam_rgb.cols)
