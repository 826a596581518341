"""The fused per-frame device program: one dispatch per frame.

Latency analysis on real TPU hardware showed the modular per-stage path
(detect -> match -> track -> spawn -> update as separate jit calls with
host decisions between them) is dominated by host<->device round trips —
~10 per frame, each paying tunnel/dispatch latency.  This module fuses the
ENTIRE per-frame pipeline (reference PoseTracker3D::compute,
pose_tracker_3d.cpp:32-200, including the _registerRecursive retry ladder
:300-419, the adaptive window controller :251-288, landmark creation
:475-549 and the detector threshold controller
base_framepoint_generator.cpp:355-459) into ONE XLA program over a
device-resident TrackerState:

  * retries   -> nested lax.cond re-runs of the matcher/solver with wider
                 gates (both branches compiled once);
  * landmark allocation -> device prefix-sum slot assignment against an
                 in-state next_slot counter (host free-list bookkeeping is
                 reconciled only at merge events);
  * adaptive scalars (search radius, descriptor gate, FAST threshold) ->
                 carried in-state and updated in-graph.

Per frame the host does: upload 2 images, one frame_step dispatch, read
back a (4,4) pose + a handful of stats scalars.

The modular kernels in mapping/frame.py remain the unit-tested reference
implementations; this program calls the same functions (nested jit is
inlined during tracing), so the two paths cannot diverge.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.mapping import frame as frame_mod
from vslam_tpu.mapping import landmarks as lm_mod
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.ops import lie
from vslam_tpu.solve import gn


class TrackerState(NamedTuple):
    """Complete device-resident tracker state."""

    prev: frame_mod.FrameState
    table: lm_mod.LandmarkTable
    T_world_cam: jnp.ndarray  # (4, 4)
    last_motion: jnp.ndarray  # (4, 4) T_cur_prev
    radius_px: jnp.ndarray  # f32 scalar
    desc_gate: jnp.ndarray  # f32 scalar
    threshold: jnp.ndarray  # f32 scalar (FAST)
    next_slot: jnp.ndarray  # int32 scalar
    frame_idx: jnp.ndarray  # int32 scalar
    has_prev: jnp.ndarray  # bool scalar
    ring: jnp.ndarray  # (RING, RING_W) f32 packed per-frame results


# Ring row layout: flattened pose (16) + stats.  A single host readback of
# the ring harvests many frames in one transfer — over a tunneled device
# link every device->host get costs ~30 ms regardless of size, so per-frame
# readbacks (even of a scalar) would cap the pipeline at ~30 fps.
RING_W = 24
_R_POSE = slice(0, 16)
_R_NKP, _R_NFP, _R_NMATCH, _R_NINL, _R_OK, _R_CHI2, _R_NSPAWN, _R_FIDX = range(16, 24)


class StepStats(NamedTuple):
    n_keypoints: jnp.ndarray
    n_framepoints: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    tracking_ok: jnp.ndarray
    mean_chi2: jnp.ndarray
    n_spawned: jnp.ndarray


class FusedParams(NamedTuple):
    """Static compile-time parameters of the fused program."""

    capacity: int = 1024
    bin_size: int = 16
    border: int = 20
    mode: str = "stereo"  # stereo | depth
    descriptor: str = "BRIEF256"  # BRIEF256 (dense) | ORB256 (rotated, gather)
    max_hamming_stereo: int = 60
    epipolar_tol: float = 1.5
    min_disparity: float = 1.0
    max_disparity: float = 200.0
    min_depth: float = 0.3
    max_depth: float = 10.0
    min_track_for_landmark: int = 2
    min_inliers: int = 20
    radius_min: float = 50.0
    radius_max: float = 150.0
    gate_min: float = 60.0
    gate_max: float = 90.0
    good_tracking_ratio: float = 0.3
    target_keypoints: int = 700
    threshold_min: float = 5.0
    threshold_max: float = 100.0
    threshold_max_change: float = 10.0
    ring_size: int = 64  # device-side result ring capacity (frames)
    gn_config: gn.GNConfig = gn.GNConfig()


def init_state(cam: cam_ops.CameraParams, params: FusedParams,
               landmark_capacity: int, threshold0: float) -> TrackerState:
    return TrackerState(
        prev=frame_mod.empty_frame(params.capacity),
        table=lm_mod.empty_table(landmark_capacity),
        T_world_cam=jnp.eye(4),
        last_motion=jnp.eye(4),
        radius_px=jnp.float32(params.radius_min),
        desc_gate=jnp.float32(params.gate_min),
        threshold=jnp.float32(threshold0),
        next_slot=jnp.int32(0),
        frame_idx=jnp.int32(0),
        has_prev=jnp.asarray(False),
        ring=jnp.zeros((params.ring_size, RING_W), jnp.float32),
    )


def _front_end(cam, params: FusedParams, state, img_l, img_r):
    if params.mode == "stereo":
        return frame_mod.process_stereo_pair(
            cam, img_l, img_r, state.threshold,
            jnp.int32(params.max_hamming_stereo),
            jnp.float32(params.epipolar_tol),
            jnp.float32(params.min_disparity),
            jnp.float32(params.max_disparity),
            capacity=params.capacity,
            bin_size=params.bin_size,
            border=params.border,
            descriptor=params.descriptor,
        )
    return frame_mod.process_depth_frame(
        cam, img_l, img_r, state.threshold,
        jnp.float32(params.min_depth), jnp.float32(params.max_depth),
        capacity=params.capacity, bin_size=params.bin_size, border=params.border,
        descriptor=params.descriptor,
    )


def _spawn_and_update(cam, params: FusedParams, state, cur):
    """Device-side landmark allocation + batched refinement."""
    table = state.table
    cap_lm = table.capacity
    needs = cur.valid & (cur.landmark_slot < 0) & (
        cur.track_len >= params.min_track_for_landmark
    )
    order = jnp.cumsum(needs.astype(jnp.int32)) - 1  # rank among spawners
    slot = state.next_slot + order
    slot = jnp.where(needs & (slot < cap_lm), slot, -1).astype(jnp.int32)
    n_spawned = jnp.sum(slot >= 0).astype(jnp.int32)
    next_slot = jnp.minimum(state.next_slot + jnp.sum(needs), cap_lm).astype(jnp.int32)

    xyz_w = lie.transform_point_cloud(state.T_world_cam, cur.p_cam)
    table = lm_mod.spawn_landmarks(table, slot, xyz_w, cur.desc, state.frame_idx)
    cur = cur._replace(
        landmark_slot=jnp.where(slot >= 0, slot, cur.landmark_slot)
    )
    table = lm_mod.update_observed(
        cam, table, state.T_world_cam,
        cur.landmark_slot, cur.uv4, cur.desc, cur.valid, state.frame_idx,
        mode=params.mode,
    )
    return table, cur, next_slot, n_spawned


def make_frame_step(params: FusedParams):
    """Build the fused step specialized to static params.

    The returned `step(cam, state, imgs, motion_model_on)` processes one
    frame entirely on device and returns (new_state, stats); buffer
    donation recycles the old state's memory (the landmark table dominates).
    """

    track_fn = (
        frame_mod.track_and_align
        if params.mode == "stereo"
        else frame_mod.track_and_align_uvd
    )

    # NOTE: no buffer donation — the batched ring readback holds references
    # to prior states while steps are in flight; donating the state would
    # free those buffers mid-read.  State is ~tens of MB, so
    # double-buffering is cheap.
    @jax.jit
    def step(cam, state: TrackerState, chunk, idx, motion_model_on):
        # chunk: (C, 2, H, W) — uint8 (stereo pairs) or f32 (intensity +
        # depth_m); idx selects this step's frame.  Frames are uploaded in
        # C-frame chunks because over a tunneled device link every transfer
        # interleaved with execution breaks the dispatch pipeline (~27 ms
        # regardless of size); one chunk upload amortizes that across C
        # frames.
        imgs = jax.lax.dynamic_index_in_dim(chunk, idx, 0, keepdims=False)
        img_l = imgs[0].astype(jnp.float32)
        img_r = imgs[1].astype(jnp.float32)
        cur, n_kp, n_fp = _front_end(cam, params, state, img_l, img_r)

        # In-graph detector threshold controller
        # (base_framepoint_generator.cpp:440-459).
        err = (n_kp.astype(jnp.float32) - params.target_keypoints) / params.target_keypoints
        delta = jnp.clip(err * params.threshold_max_change,
                         -params.threshold_max_change, params.threshold_max_change)
        threshold = jnp.clip(state.threshold + delta,
                             params.threshold_min, params.threshold_max)

        weights = lm_mod.landmark_weights(state.table, state.prev.landmark_slot)
        T_guess = jnp.where(motion_model_on, state.last_motion, jnp.eye(4))

        def attempt(radius, gate, guess):
            return track_fn(
                cam, state.prev, cur, guess, radius, gate.astype(jnp.int32),
                weights, params.gn_config,
            )

        res1 = attempt(state.radius_px, state.desc_gate, T_guess)
        ok1 = res1.converged & (res1.n_inliers >= params.min_inliers)

        def retry2(_):
            return attempt(
                jnp.minimum(2.0 * state.radius_px, params.radius_max),
                jnp.minimum(state.desc_gate + 10.0, params.gate_max),
                T_guess,
            )

        res2 = jax.lax.cond(ok1, lambda _: res1, retry2, None)
        ok2 = res2.converged & (res2.n_inliers >= params.min_inliers)

        def retry3(_):
            return attempt(
                jnp.float32(params.radius_max), jnp.float32(params.gate_max),
                jnp.eye(4),
            )

        res = jax.lax.cond(ok2, lambda _: res2, retry3, None)
        ok = res.converged & (res.n_inliers >= params.min_inliers) & state.has_prev

        motion = jnp.where(ok, res.T_cur_prev, T_guess)
        # Seed frames (first frame / checkpoint resume) dead-reckon on the
        # motion model so the trajectory stays continuous; T_guess is
        # identity at frame 0 (last_motion initializes to identity).
        motion = jnp.where(state.has_prev, motion, T_guess)
        T_world_cam = state.T_world_cam @ lie.inverse(motion)

        # Track propagation only on success (reference breakTrack otherwise).
        prop = frame_mod.propagate_tracks(state.prev, cur, res.prev_to_cur)
        cur = jax.tree.map(lambda a, b: jnp.where(ok, a, b), prop, cur)

        new_state = state._replace(T_world_cam=T_world_cam)
        table, cur, next_slot, n_spawned = _spawn_and_update(
            cam, params, new_state, cur
        )

        # Adaptive search window (pose_tracker_3d.cpp:251-288).
        n_prev = jnp.maximum(jnp.sum(state.prev.valid), 1)
        ratio = res.n_matches.astype(jnp.float32) / n_prev.astype(jnp.float32)
        poor = ratio < params.good_tracking_ratio
        radius = jnp.where(poor, jnp.minimum(state.radius_px * 1.2, params.radius_max),
                           jnp.maximum(state.radius_px * 0.95, params.radius_min))
        gate = jnp.where(poor, jnp.minimum(state.desc_gate + 5.0, params.gate_max),
                         jnp.maximum(state.desc_gate - 1.0, params.gate_min))

        row = jnp.concatenate([
            T_world_cam.reshape(16),
            jnp.stack([
                n_kp.astype(jnp.float32),
                n_fp.astype(jnp.float32),
                res.n_matches.astype(jnp.float32),
                res.n_inliers.astype(jnp.float32),
                (ok | ~state.has_prev).astype(jnp.float32),
                res.mean_chi2.astype(jnp.float32),
                n_spawned.astype(jnp.float32),
                state.frame_idx.astype(jnp.float32),
            ]),
        ])
        ring = jax.lax.dynamic_update_slice(
            state.ring, row[None, :], (state.frame_idx % params.ring_size, 0)
        )

        out = TrackerState(
            prev=cur,
            table=table,
            T_world_cam=T_world_cam,
            last_motion=jnp.where(state.has_prev, motion, state.last_motion),
            radius_px=radius,
            desc_gate=gate,
            threshold=threshold,
            next_slot=next_slot,
            frame_idx=state.frame_idx + 1,
            has_prev=jnp.asarray(True),
            ring=ring,
        )
        stats = StepStats(
            n_keypoints=n_kp,
            n_framepoints=n_fp,
            n_matches=res.n_matches,
            n_inliers=res.n_inliers,
            tracking_ok=ok | ~state.has_prev,
            mean_chi2=res.mean_chi2,
            n_spawned=n_spawned,
        )
        return out, stats

    return step
