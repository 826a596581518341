"""SlamEngine: full-system orchestration.

The TPU-native SLAMAssembly (reference src/system/slam_assembly.cpp):
wires the pose tracker, world map (keyframe/local-map creation), the
Hamming-database relocalizer, landmark merging, and the pose-graph
back-end; owns the per-frame `process` loop, trajectory output and the
end-of-run performance report (printReport parity,
slam_assembly.cpp:622-744).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vslam_tpu.backend import pose_graph as pg
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.loop.relocalizer import Relocalizer
from vslam_tpu.mapping import merging
from vslam_tpu.mapping.local_maps import WorldMap
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.tracking.tracker import FusedPoseTracker, PoseTracker


class SlamEngine:
    def __init__(
        self,
        cam: cam_ops.CameraParams,
        config: ParameterCollection | None = None,
        landmark_capacity: int = 65536,
    ):
        self.cfg = config or ParameterCollection()
        self.cam = cam
        tracker_cls = (
            FusedPoseTracker if self.cfg.tracking.use_fused_tracker else PoseTracker
        )
        self.tracker = tracker_cls(cam, self.cfg, landmark_capacity)
        wm = self.cfg.world_map
        self.world_map = WorldMap(
            min_distance=wm.minimum_distance_traveled_for_local_map,
            min_degrees=wm.minimum_degrees_rotated_for_local_map,
            min_frames=wm.minimum_number_of_frames_for_local_map,
        )
        self.relocalizer = Relocalizer(self.cfg.relocalization)
        self.open_loop = self.cfg.command_line.option_disable_relocalization
        # Pose-graph bookkeeping: one vertex per local map keyframe.
        self.kf_poses: list[np.ndarray] = []
        self.kf_odometry: list[np.ndarray] = []  # T_{k-1,k} measured
        self.closure_edges: list[tuple[int, int, np.ndarray]] = []
        self.n_optimizations = 0
        self.n_merges = 0
        self._t_start = time.perf_counter()
        self._frame_times: list[float] = []

    # ------------------------------------------------------------------
    def process(self, img_l: np.ndarray, img_r: np.ndarray) -> np.ndarray:
        """Process one stereo frame; returns current T_world_cam."""
        t0 = time.perf_counter()
        T = self.tracker.compute(img_l, img_r)

        if self.world_map.should_create_local_map(T):
            # Keyframe work reads full tracker state: drain the pipelined
            # readback first so pose and frame arrays are in sync.
            self._flush_tracker()
            self._create_local_map_and_close_loops(self.tracker.T_world_cam)
        self._frame_times.append(time.perf_counter() - t0)
        return T

    def _flush_tracker(self):
        if hasattr(self.tracker, "flush"):
            self.tracker.flush()

    # ------------------------------------------------------------------
    def _create_local_map_and_close_loops(self, T_world_cam: np.ndarray):
        tracker = self.tracker
        frame = tracker.prev_frame
        if frame is None:
            return
        valid = np.asarray(frame.valid)
        slots = np.asarray(frame.landmark_slot)
        sel = valid & (slots >= 0)
        if sel.sum() < self.cfg.local_map.minimum_number_of_landmarks:
            return
        rows = np.flatnonzero(sel)
        max_lm = self.cfg.local_map.maximum_number_of_landmarks
        rows = rows[:max_lm]
        lm_slots = slots[rows]
        xyz_world = np.asarray(tracker.table.xyz_w)[lm_slots]
        desc = np.asarray(tracker.table.desc)[lm_slots]

        local_map = self.world_map.create_local_map(
            T_world_cam, tracker.frame_idx, lm_slots, xyz_world, desc
        )

        # Pose-graph vertex + odometry edge.
        self.kf_poses.append(T_world_cam.copy())
        if len(self.kf_poses) > 1:
            self.kf_odometry.append(
                np.linalg.inv(self.kf_poses[-2]) @ self.kf_poses[-1]
            )

        if self.open_loop:
            self.relocalizer.add_local_map(local_map)
            return

        closure = self.relocalizer.detect_and_verify(local_map)
        self.relocalizer.add_local_map(local_map)
        if closure is None:
            return

        self.world_map.add_closure(closure)
        # T_ref_query maps query-keyframe coords into reference-keyframe
        # coords, i.e. the measured relative pose T_{ref<-query}; the pose
        # graph wants T_ij = T_i^-1 T_j with i=reference vertex.
        self.closure_edges.append(
            (closure.reference_id, closure.query_id, closure.T_ref_query)
        )
        self._optimize_pose_graph()

        # Merge corresponding landmarks (reference mergeLandmarks after
        # closure optimization, world_map.cpp:305).
        tracker.table, remap = merging.merge_landmarks(
            tracker.table, tracker.allocator, closure.correspondences
        )
        self.n_merges += len(remap)
        if remap and tracker.prev_frame is not None:
            ls = np.array(tracker.prev_frame.landmark_slot)  # mutable copy
            for src, dst in remap.items():
                ls[ls == src] = dst
            tracker.prev_frame = tracker.prev_frame._replace(
                landmark_slot=jnp.asarray(ls)
            )

    # ------------------------------------------------------------------
    def _optimize_pose_graph(self):
        """Optimize keyframe poses; rigidly propagate the correction into
        the tracker pose and the landmark table (reference
        optimizePoseGraph back-propagation, graph_optimizer.cpp:411-457)."""
        n = len(self.kf_poses)
        if n < 3:
            return
        ei, ej, eT, ew = [], [], [], []
        for k in range(1, n):
            ei.append(k - 1)
            ej.append(k)
            eT.append(self.kf_odometry[k - 1])
            ew.append(1.0)
        for (i, j, T_ij) in self.closure_edges:
            ei.append(i)
            ej.append(j)
            eT.append(T_ij)
            ew.append(10.0)  # closure edges x10 (graph_optimizer.cpp:301)

        # Pad poses/edges to power-of-two buckets: the optimizer then
        # compiles once per bucket instead of once per keyframe count.
        def pow2(x):
            return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 3)

        P_pad, E_pad = pow2(n), pow2(len(ei))
        poses_arr = np.tile(np.eye(4, dtype=np.float32), (P_pad, 1, 1))
        poses_arr[:n] = np.stack(self.kf_poses).astype(np.float32)
        eT_arr = np.tile(np.eye(4, dtype=np.float32), (E_pad, 1, 1))
        eT_arr[: len(ei)] = np.stack(eT).astype(np.float32)
        ei_arr = np.zeros(E_pad, np.int32)
        ej_arr = np.zeros(E_pad, np.int32)
        ew_arr = np.zeros(E_pad, np.float32)
        ei_arr[: len(ei)] = ei
        ej_arr[: len(ej)] = ej
        ew_arr[: len(ew)] = ew

        graph = pg.PoseGraph(
            poses=jnp.asarray(poses_arr),
            edge_i=jnp.asarray(ei_arr),
            edge_j=jnp.asarray(ej_arr),
            edge_T_ij=jnp.asarray(eT_arr),
            edge_weight=jnp.asarray(ew_arr),
            edge_valid=jnp.asarray(np.arange(E_pad) < len(ei)),
            pose_valid=jnp.asarray(np.arange(P_pad) < n),
        )
        opt, _ = pg.optimize_pose_graph(
            graph,
            iterations=self.cfg.graph_optimization.maximum_number_of_iterations,
        )
        opt = np.asarray(opt)[:n]

        # Rigid back-propagation: move landmarks with their origin local
        # map, and the live tracker pose with the last keyframe.
        self._propagate_corrections(opt)
        self.kf_poses = [opt[k].copy() for k in range(n)]
        self.n_optimizations += 1

    def _propagate_corrections(self, opt_poses: np.ndarray):
        tracker = self.tracker
        corrections = [
            opt_poses[k] @ np.linalg.inv(self.kf_poses[k])
            for k in range(len(self.kf_poses))
        ]
        # Landmarks move with the local map that created them... approximated
        # by their last_seen frame's owning local map: assign each landmark
        # to the nearest keyframe index at creation.  For round 1 the
        # dominant effect — the most recent segment — is captured by moving
        # every landmark with its closest keyframe correction.
        kf_frames = np.asarray([m.keyframe_index for m in self.world_map.local_maps])
        last_seen = np.asarray(tracker.table.last_seen)
        valid = np.asarray(tracker.table.valid)
        if len(kf_frames) == 0 or not valid.any():
            return
        owner = np.searchsorted(kf_frames, last_seen, side="left")
        owner = np.clip(owner, 0, len(corrections) - 1)
        xyz = np.asarray(tracker.table.xyz_w).copy()
        for k, C in enumerate(corrections):
            sel = valid & (owner == k)
            if not sel.any():
                continue
            xyz[sel] = xyz[sel] @ C[:3, :3].T + C[:3, 3]
        tracker.table = tracker.table._replace(xyz_w=jnp.asarray(xyz))

        # Live pose + motion model move with the last keyframe.
        C_last = corrections[-1].astype(np.float32)
        tracker.T_world_cam = (C_last @ tracker.T_world_cam).astype(np.float32)
        # Rewrite the stored trajectory back to the last keyframe so output
        # reflects the optimized past (reference rewrites local map frames).
        kf_idx = self.world_map.local_maps[-1].keyframe_index
        for t in range(kf_idx, len(tracker.trajectory)):
            tracker.trajectory[t] = (C_last @ tracker.trajectory[t]).astype(np.float32)

    # ------------------------------------------------------------------
    @property
    def trajectory(self) -> np.ndarray:
        self._flush_tracker()
        return np.stack(self.tracker.trajectory)

    def report(self) -> dict:
        """printReport parity (slam_assembly.cpp:622-744)."""
        self._flush_tracker()
        ft = np.asarray(self._frame_times) if self._frame_times else np.zeros(1)
        stats = self.tracker.stats
        total = time.perf_counter() - self._t_start
        rep = {
            "total_frames": stats.n_frames,
            "total_compute_time_s": round(float(ft.sum()), 3),
            "mean_frame_time_s": round(float(ft.mean()), 4),
            "mean_frame_hz": round(float(1.0 / max(ft.mean(), 1e-9)), 2),
            "median_frame_time_s": round(float(np.median(ft)), 4),
            "max_frame_time_s": round(float(ft.max()), 4),
            "wall_time_s": round(total, 3),
            "n_landmarks": self.tracker.allocator.num_allocated,
            "n_local_maps": len(self.world_map),
            "n_closures": len(self.world_map.closures),
            "n_optimizations": self.n_optimizations,
            "n_merged_landmarks": self.n_merges,
            "n_track_breaks": stats.n_breaks,
            "stage_seconds": {
                k: round(v, 3) for k, v in stats.stage_seconds.items()
            },
        }
        return rep

    def print_report(self):
        rep = self.report()
        print("-" * 60)
        print("vslam_tpu run report")
        for k, v in rep.items():
            print(f"  {k:26s} {v}")
        print("-" * 60)
