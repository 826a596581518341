"""Windowed full bundle adjustment inside the live SLAM loop.

The reference's full-BA mode (GraphOptimizer::addPoseWithFactors +
optimizeFactorGraph, src/map_optimization/graph_optimizer.cpp:319-409,
459-488) re-optimizes recent keyframe poses AND landmark positions every
`number_of_frames_per_bundle_adjustment` frames, then back-propagates both.
Here the factor graph is assembled from the keyframe snapshots the fused
tracker already harvests (each LocalMap carries the stereo observation
[uL,vL,uR,vR] of every snapshotted landmark — exactly one BA measurement
row), solved by the Schur-complement solver (backend/ba.py), sharded over
the device mesh when more than one device is available
(parallel/sharded_ba.py), and scattered back into the landmark table and
the keyframe/trajectory bookkeeping.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vslam_tpu.backend import ba as ba_mod
from vslam_tpu.mapping import landmarks as lm_mod

# Static problem shape (compiled once): the optimization window covers the
# last WINDOW keyframes; each landmark contributes up to OMAX observations
# (its MOST RECENT ones — a long-lived landmark keeps a ring of its last
# OMAX keyframe observations instead of silently truncating to the first
# few, cf. reference optimizeFactorGraph which keeps every measurement,
# graph_optimizer.cpp:319-409).
WINDOW = 16
OMAX = 16
MIN_OBS = 2  # landmarks observed once constrain nothing jointly


def build_window_problem(engine, window: int = WINDOW, omax: int = OMAX):
    """Assemble a BAProblem over the last `window` keyframes.

    Returns (problem, kf_ids (P,) global keyframe ids, slot_arr (L,) table
    slots, L_real) or None if the window holds too few observations.
    """
    maps = engine.world_map.local_maps[-window:]
    maps = [m for m in maps if m.uv4 is not None]
    if len(maps) < 2:
        return None
    kf_ids = [m.map_id for m in maps]
    P = window

    # Group observations by landmark slot.
    obs: dict[int, list[tuple[int, np.ndarray]]] = {}
    for local_cam, m in enumerate(maps):
        for s, uv in zip(m.landmark_slots, m.uv4):
            if s >= 0:
                obs.setdefault(int(s), []).append((local_cam, uv))
    slots = [s for s, o in obs.items() if len(o) >= MIN_OBS]
    if len(slots) < 16:
        return None

    table = engine.tracker.table
    xyz_all = np.asarray(table.xyz_w)
    nup_all = np.asarray(table.n_updates)

    def pow2(x):
        return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 6)

    L = pow2(len(slots))
    slot_arr = np.zeros(L, np.int32)
    slot_arr[: len(slots)] = slots
    xyz = np.zeros((L, 3), np.float32)
    obs_cam = np.zeros((L, omax), np.int32)
    obs_uv4 = np.zeros((L, omax, 4), np.float32)
    obs_w = np.zeros((L, omax), np.float32)
    obs_mask = np.zeros((L, omax), bool)
    lm_valid = np.zeros(L, bool)
    for li, s in enumerate(slots):
        xyz[li] = xyz_all[s]
        w = 1.0 + np.log1p(float(nup_all[s]))
        for oi, (c, uv) in enumerate(obs[s][-omax:]):
            obs_cam[li, oi] = c
            obs_uv4[li, oi] = uv
            obs_w[li, oi] = w
            obs_mask[li, oi] = True
        lm_valid[li] = True

    T_wc = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    cam_fixed = np.ones(P, bool)  # padding cameras frozen
    for ci, m in enumerate(maps):
        T_wc[ci] = m.T_world_kf
        cam_fixed[ci] = False
    cam_fixed[0] = True  # gauge: anchor the oldest keyframe in the window

    prob = ba_mod.BAProblem(
        T_wc=jnp.asarray(T_wc),
        xyz=jnp.asarray(xyz),
        obs_cam=jnp.asarray(obs_cam),
        obs_uv4=jnp.asarray(obs_uv4),
        obs_weight=jnp.asarray(obs_w),
        obs_mask=jnp.asarray(obs_mask),
        lm_valid=jnp.asarray(lm_valid),
        cam_fixed=jnp.asarray(cam_fixed),
    )
    return prob, kf_ids, slot_arr, len(slots)


def run_windowed_ba(engine, iterations: int | None = None) -> np.ndarray | None:
    """Build + solve the windowed BA problem and back-propagate.

    Returns the correction applied to the newest keyframe (and the live
    pose), or None if no BA ran.
    """
    built = build_window_problem(engine)
    if built is None:
        return None
    prob, kf_ids, slot_arr, n_lm = built
    config = ba_mod.BAConfig(
        iterations=iterations
        or engine.cfg.graph_optimization.maximum_number_of_iterations,
        # enable_robust_kernel_for_landmarks (reference _setPointEdge
        # Cauchy kernel gate, graph_optimizer.cpp:524): disabled = no
        # reweighting (threshold effectively infinite).
        robust_chi2=(
            engine.cfg.tracking.aligner_maximum_error_kernel
            if engine.cfg.graph_optimization.enable_robust_kernel_for_landmarks
            else 1e12
        ),
    )

    n_dev = len(jax.devices())
    if n_dev > 1 and engine.cfg.parallelism.shard_landmarks:
        from vslam_tpu.parallel import mesh as mesh_mod
        from vslam_tpu.parallel import sharded_ba

        mesh = mesh_mod.make_mesh()
        # L is a power of two >= 64, so it divides across any 2^k mesh.
        T_opt, xyz_opt, _ = sharded_ba.bundle_adjust_sharded(
            engine.cam, prob, mesh, config
        )
    else:
        T_opt, xyz_opt, _ = ba_mod.bundle_adjust(engine.cam, prob, config)
    T_opt = np.asarray(T_opt)
    xyz_opt = np.asarray(xyz_opt)
    if not (np.all(np.isfinite(T_opt)) and np.all(np.isfinite(xyz_opt))):
        return None

    tracker = engine.tracker

    # Landmark write-back (graph_optimizer.cpp:478-486).
    use = np.zeros(len(slot_arr), bool)
    use[:n_lm] = True
    tracker.table = lm_mod.scatter_xyz(
        tracker.table,
        jnp.asarray(slot_arr),
        jnp.asarray(xyz_opt),
        jnp.asarray(use),
    )

    # Pose write-back: per-keyframe corrections inside the window propagate
    # to the stored trajectory segments; the newest keyframe's correction
    # also moves the live pose.
    corrections = {}
    for ci, k in enumerate(kf_ids):
        C = (T_opt[ci] @ np.linalg.inv(engine.kf_poses[k])).astype(np.float32)
        corrections[k] = C
        engine.kf_poses[k] = T_opt[ci].astype(np.float32).copy()
        engine.world_map.local_maps[k].T_world_kf = engine.kf_poses[k].copy()

    traj = tracker.trajectory
    if traj:
        kf_frames = np.asarray(engine.kf_frame_indices)
        f_idx = np.arange(len(traj))
        owner = np.clip(
            np.searchsorted(kf_frames, f_idx, side="left"),
            0,
            len(engine.kf_frame_indices) - 1,
        )
        stacked = np.stack(traj).astype(np.float32)
        for k, C in corrections.items():
            sel = owner == k
            if sel.any():
                stacked[sel] = np.einsum("ij,fjk->fik", C, stacked[sel])
        tracker.trajectory = [stacked[f] for f in range(len(traj))]

    C_last = corrections[kf_ids[-1]]
    if hasattr(tracker, "apply_world_correction"):
        tracker.apply_world_correction(C_last)
    else:
        tracker.T_world_cam = (C_last @ tracker.T_world_cam).astype(np.float32)
    if engine.world_map._last_T is not None:
        engine.world_map._last_T = (
            C_last @ engine.world_map._last_T
        ).astype(np.float32)
    return C_last
