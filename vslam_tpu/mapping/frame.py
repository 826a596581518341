"""Per-frame state and the fused front-end / tracking device programs.

FrameState is the TPU-native replacement for the reference's
Frame + FramePoint object graph (src/types/frame.h:92-106,
src/types/frame_point.h:18-203): a fixed-capacity SoA pytree with a valid
mask; the pointer-based temporal track (`previous`/`next`) becomes the
integer columns `track_len` and `landmark_slot` carried forward by the
tracker.

Two fused jit programs do all per-frame device math:

  process_stereo_pair  detect L/R -> describe L/R -> epipolar match ->
                       triangulate -> compact (the reference's
                       `initialize` + `compute`,
                       stereo_framepoint_generator.cpp:73-133,135-426)
  track_and_align      project prior points -> windowed Hamming match ->
                       build 4D residuals -> robust GN pose solve (the
                       reference's `track` + StereoUVAligner::converge,
                       stereo_framepoint_generator.cpp:464-681 +
                       stereouv_aligner.cpp:210-255)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.frontend import brief, detect, matching, orb


def _describe(img, uv, descriptor: str):
    """Descriptor dispatch: dense BRIEF (reference default, gather-free,
    ~40x faster on TPU) or rotation-aware gather ORB."""
    if descriptor == "ORB256":
        return orb.describe(img, uv)
    return brief.describe_dense(img, uv)
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.ops import lie
from vslam_tpu.solve import aligners, gn


class FrameState(NamedTuple):
    """Stereo framepoints of one frame (capacity K, masked, compacted)."""

    uv4: jnp.ndarray  # (K, 4) [uL, vL, uR, vR]
    desc: jnp.ndarray  # (K, 8) uint32 left descriptors
    p_cam: jnp.ndarray  # (K, 3) points in this camera's frame
    valid: jnp.ndarray  # (K,) bool
    track_len: jnp.ndarray  # (K,) int32, 1 for fresh stereo points
    landmark_slot: jnp.ndarray  # (K,) int32 into the landmark table, -1 none

    @property
    def capacity(self):
        return self.uv4.shape[0]


def empty_frame(capacity: int) -> FrameState:
    return FrameState(
        uv4=jnp.zeros((capacity, 4), jnp.float32),
        desc=jnp.zeros((capacity, 8), jnp.uint32),
        p_cam=jnp.zeros((capacity, 3), jnp.float32),
        valid=jnp.zeros(capacity, bool),
        track_len=jnp.zeros(capacity, jnp.int32),
        landmark_slot=jnp.full(capacity, -1, jnp.int32),
    )


def _compact(order_key: jnp.ndarray, *arrays):
    """Stable-sort arrays so rows with order_key False go first... inverted:
    valid rows first.  order_key: (K,) bool valid."""
    perm = jnp.argsort(~order_key, stable=True)
    return tuple(a[perm] for a in arrays)


@partial(jax.jit, static_argnames=("capacity", "bin_size", "border", "descriptor"))
def process_stereo_pair(
    cam: cam_ops.CameraParams,
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    threshold: jnp.ndarray,
    max_hamming_stereo: jnp.ndarray,
    epipolar_tol: jnp.ndarray,
    min_disparity: jnp.ndarray,
    max_disparity: jnp.ndarray,
    capacity: int = 1024,
    bin_size: int = 16,
    border: int = 20,
    descriptor: str = "BRIEF256",
):
    """Full stereo front-end for one image pair, one XLA program.

    Returns (FrameState, n_keypoints_left (int32), n_framepoints (int32)).
    """
    kl = detect.detect_keypoints(img_l, threshold, bin_size, capacity, border)
    kr = detect.detect_keypoints(img_r, threshold, bin_size, capacity, border)
    if descriptor == "ORB256":
        dl = _describe(img_l, kl.uv, descriptor)
        dr = _describe(img_r, kr.uv, descriptor)
    else:
        dl, dr = brief.describe_dense_pair(img_l, img_r, kl.uv, kr.uv)

    m = matching.match_stereo(
        kl.uv, dl, kl.valid, kr.uv, dr, kr.valid,
        max_hamming_stereo, epipolar_tol, min_disparity, max_disparity,
    )
    uv_l = kl.uv
    uv_r = kr.uv[m.right_idx]
    p_cam, tri_ok = cam_ops.triangulate_disparity(cam, uv_l, uv_r, 1.0)
    valid = m.valid & kl.valid & tri_ok

    uv4 = jnp.concatenate([uv_l, uv_r], axis=1)
    uv4, desc, p_cam, valid = _compact(valid, uv4, dl, p_cam, valid)
    frame = FrameState(
        uv4=uv4,
        desc=desc,
        p_cam=p_cam,
        valid=valid,
        track_len=jnp.where(valid, 1, 0).astype(jnp.int32),
        landmark_slot=jnp.full(capacity, -1, jnp.int32),
    )
    return frame, jnp.sum(kl.valid).astype(jnp.int32), jnp.sum(valid).astype(jnp.int32)


@partial(jax.jit, static_argnames=("capacity", "bin_size", "border", "descriptor"))
def process_depth_frame(
    cam: cam_ops.CameraParams,
    img: jnp.ndarray,
    depth_m: jnp.ndarray,  # registered to the intensity camera
    threshold: jnp.ndarray,
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    capacity: int = 1024,
    bin_size: int = 16,
    border: int = 20,
    descriptor: str = "BRIEF256",
):
    """RGB-D front-end: detect -> describe -> depth gather -> back-project.

    FrameState.uv4 carries [u, v, depth_m, 0] in depth mode (the 4th slot
    unused).  Reference: DepthFramePointGenerator::compute
    (depth_framepoint_generator.cpp:46-164).
    """
    from vslam_tpu.frontend import depth as depth_mod

    kp = detect.detect_keypoints(img, threshold, bin_size, capacity, border)
    desc = _describe(img, kp.uv, descriptor)
    z = depth_mod.gather_depth(depth_m, kp.uv)
    valid = kp.valid & (z >= min_depth) & (z <= max_depth)
    p_cam = cam_ops.back_project(cam, kp.uv, z)

    uv4 = jnp.concatenate([kp.uv, z[:, None], jnp.zeros_like(z[:, None])], axis=1)
    uv4, desc, p_cam, valid = _compact(valid, uv4, desc, p_cam, valid)
    frame = FrameState(
        uv4=uv4,
        desc=desc,
        p_cam=p_cam,
        valid=valid,
        track_len=jnp.where(valid, 1, 0).astype(jnp.int32),
        landmark_slot=jnp.full(capacity, -1, jnp.int32),
    )
    return frame, jnp.sum(kp.valid).astype(jnp.int32), jnp.sum(valid).astype(jnp.int32)


class TrackResult(NamedTuple):
    T_cur_prev: jnp.ndarray  # (4, 4) estimated camera motion
    prev_to_cur: jnp.ndarray  # (Kprev,) int32 index into cur frame, -1 unmatched
    n_matches: jnp.ndarray  # int32
    n_inliers: jnp.ndarray  # int32
    mean_chi2: jnp.ndarray  # f32
    converged: jnp.ndarray  # bool


@partial(jax.jit, static_argnames=("gn_config",))
def track_and_align(
    cam: cam_ops.CameraParams,
    prev: FrameState,
    cur: FrameState,
    T_guess: jnp.ndarray,  # (4, 4) prev-camera -> cur-camera
    radius_px: jnp.ndarray,
    max_hamming: jnp.ndarray,
    point_weights: jnp.ndarray,  # (Kprev,) landmark-informed weights
    gn_config: gn.GNConfig = gn.GNConfig(),
) -> TrackResult:
    """Track prev framepoints into cur and solve for the camera motion."""
    p_pred = lie.transform_point_cloud(T_guess, prev.p_cam)
    proj_uv, z_pred = cam_ops.project(cam, p_pred)
    predictable = prev.valid & (z_pred > 0.05)

    m = matching.match_projective(
        proj_uv, prev.desc, predictable,
        cur.uv4[:, :2], cur.desc, cur.valid,
        radius_px, max_hamming,
    )
    matched = m.valid & predictable

    data = aligners.StereoUVData(
        p_prev=prev.p_cam,
        meas=cur.uv4[m.cur_idx],
        weight=point_weights,
    )
    res = aligners.stereo_uv_align(cam, data, matched, T_guess, gn_config)

    prev_to_cur = jnp.where(matched, m.cur_idx, -1).astype(jnp.int32)
    return TrackResult(
        T_cur_prev=res.x,
        prev_to_cur=prev_to_cur,
        n_matches=jnp.sum(matched).astype(jnp.int32),
        n_inliers=res.num_inliers,
        mean_chi2=res.chi2,
        converged=res.converged,
    )


@partial(jax.jit, static_argnames=("gn_config",))
def track_and_align_uvd(
    cam: cam_ops.CameraParams,
    prev: FrameState,
    cur: FrameState,
    T_guess: jnp.ndarray,
    radius_px: jnp.ndarray,
    max_hamming: jnp.ndarray,
    point_weights: jnp.ndarray,
    gn_config: gn.GNConfig = gn.GNConfig(),
) -> TrackResult:
    """RGB-D variant of track_and_align: 3D [u, v, depth] residuals via the
    UVD aligner (reference UVDAligner, uvd_aligner.cpp)."""
    p_pred = lie.transform_point_cloud(T_guess, prev.p_cam)
    proj_uv, z_pred = cam_ops.project(cam, p_pred)
    predictable = prev.valid & (z_pred > 0.05)

    m = matching.match_projective(
        proj_uv, prev.desc, predictable,
        cur.uv4[:, :2], cur.desc, cur.valid,
        radius_px, max_hamming,
    )
    matched = m.valid & predictable

    meas = cur.uv4[m.cur_idx][:, :3]  # [u, v, depth]
    data = aligners.UVDData(
        p_prev=prev.p_cam,
        meas=meas,
        weight=point_weights,
        depth_reliable=meas[:, 2] > 0.01,
    )
    res = aligners.uvd_align(cam, data, matched, T_guess, gn_config)

    prev_to_cur = jnp.where(matched, m.cur_idx, -1).astype(jnp.int32)
    return TrackResult(
        T_cur_prev=res.x,
        prev_to_cur=prev_to_cur,
        n_matches=jnp.sum(matched).astype(jnp.int32),
        n_inliers=res.num_inliers,
        mean_chi2=res.chi2,
        converged=res.converged,
    )


@jax.jit
def propagate_tracks(
    prev: FrameState, cur: FrameState, prev_to_cur: jnp.ndarray
) -> FrameState:
    """Carry track length and landmark links from prev into matched cur
    slots (the reference's FramePoint::setPrevious chain,
    frame_point.cpp:43-55, as a scatter)."""
    matched = prev_to_cur >= 0
    tgt = jnp.where(matched, prev_to_cur, 0)
    new_len = cur.track_len.at[tgt].add(jnp.where(matched, prev.track_len, 0))
    new_lm = cur.landmark_slot.at[tgt].max(
        jnp.where(matched, prev.landmark_slot, -1)
    )
    return cur._replace(track_len=new_len, landmark_slot=new_lm)
