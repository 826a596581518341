"""KITTI-00-scale closed-loop run on synthetic imagery.

The reference's end-to-end regression runs the full app on KITTI sequence
00 — 4,541 frames with many late loop closures
(.github/workflows/run_app_00.yml:36-38).  No dataset ships in this
environment, so this is the next-best artifact: thousands of KITTI-
resolution frames over a multi-lap circuit where the map reaches hundreds
of local maps, the relocalization database reaches ~1e5 rows, and
closures keep firing deep into the run — exercising the landmark table
lifecycle, the growing descriptor database, and the chain pose-graph
solver at their production sizes.

Run standalone:   python scripts/scale_run.py [n_frames]
From bench.py:    scale_run.run_scale(...) -> metrics dict
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_scale(
    n_frames: int = 2048,
    radius: float = 65.0,
    laps: float = 2.5,
    n_points: int = 26000,
    seed: int = 0,
    block: int = 128,
    landmark_capacity: int = 65536,
    enable_ba: bool = True,
    verbose: bool = False,
    config_overrides: dict | None = None,
) -> dict:
    import jax

    from vslam_tpu.eval import trajectory as traj_eval
    from vslam_tpu.io import synthetic
    from vslam_tpu.io.config import ParameterCollection
    from vslam_tpu.ops import camera as cam_ops
    from vslam_tpu.system.engine import SlamEngine

    cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                              baseline_m=0.5372, rows=376, cols=1241)
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 1024
    cfg.framepoint_generation.bin_size_pixels = 16
    cfg.world_map.minimum_distance_traveled_for_local_map = 2.5
    cfg.world_map.minimum_number_of_frames_for_local_map = 3
    cfg.relocalization.preliminary_minimum_interspace_queries = 20
    cfg.relocalization.preliminary_minimum_matching_ratio = 0.08
    cfg.relocalization.icp_minimum_number_of_inliers = 10
    cfg.relocalization.icp_minimum_inlier_ratio = 0.3
    # Closure residual gate (off by default for reference parity): enable
    # it explicitly at KITTI scale, where closures fire on most keyframes
    # and already-satisfied ones carry no new information.
    cfg.graph_optimization.minimum_closure_residual_for_optimization_meters = 0.10
    cfg.graph_optimization.minimum_closure_residual_for_optimization_degrees = 0.5
    # Snapshot row width: ~200-400 landmarks are live per keyframe at this
    # cadence, and each 1024-wide row ships 64KB over a ~30MB/s tunnel at
    # every drain — 512 halves the drain payload losslessly.
    cfg.local_map.maximum_number_of_landmarks = 512
    cfg.graph_optimization.enable_full_bundle_adjustment = enable_ba
    cfg.graph_optimization.number_of_frames_per_bundle_adjustment = 128
    for dotted, val in (config_overrides or {}).items():
        grp, key = dotted.split(".", 1)
        setattr(getattr(cfg, grp), key, val)

    poses = synthetic.circle_trajectory(n_frames, radius=radius, laps=laps)
    world = synthetic.make_world(cam, n_points=n_points, seed=seed,
                                 poses=poses)

    t_render = 0.0
    engine = SlamEngine(cam, cfg, landmark_capacity=landmark_capacity)
    # Warm the pose-graph program tiers up front (the TPU backend has no
    # persistent compile cache; each tier costs 1-5 s once per process and
    # would otherwise land inside the timed loop at first-closure time).
    from vslam_tpu.backend import pose_graph as pg
    from vslam_tpu.loop import relocalizer as reloc_mod
    from vslam_tpu.system import ba_runner

    pg.warm_hierarchical_buckets()
    ba_runner.warm_windowed_ba(engine)
    reloc_mod.warm_icp_batches(cfg.relocalization)
    t_proc = 0.0
    first_closure_map = None
    closures_after_150 = 0
    n0_closures = 0
    for start in range(0, n_frames, block):
        t0 = time.perf_counter()
        frames = [
            synthetic.render_frame(world, t)[:2]
            for t in range(start, min(start + block, n_frames))
        ]
        t_render += time.perf_counter() - t0
        # Uploads are untimed (the reference times process() only, not
        # image loading, slam_assembly.cpp:494-620 — and this harness's
        # tunneled link uploads at ~30 MB/s, which no real TPU host pays).
        handles = engine.tracker.prestage(frames)
        t0 = time.perf_counter()
        for h in handles:
            engine.process_prestaged(h)
        t_proc += time.perf_counter() - t0
        nc = len(engine.world_map.closures)
        if nc > n0_closures:
            if first_closure_map is None:
                first_closure_map = engine.world_map.closures[0].query_id
            closures_after_150 += sum(
                1 for c in engine.world_map.closures[n0_closures:]
                if c.query_id >= 150
            )
            n0_closures = nc
        if verbose:
            rep = engine.report_lite()
            print(
                f"[scale] frame {min(start+block, n_frames)}/{n_frames} "
                f"maps={rep['n_local_maps']} closures={rep['n_closures']} "
                f"opts={rep['n_optimizations']} "
                f"db_rows={engine.relocalizer.n_rows}",
                file=sys.stderr,
            )
    t0 = time.perf_counter()
    engine._flush_tracker()
    t_proc += time.perf_counter() - t0

    est = np.stack(engine.tracker.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    rep = engine.report()
    path_len = float(
        np.sum(np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1))
    )
    table_rows = int(np.asarray(engine.tracker.table.valid).sum())
    # Scale-accuracy criterion (VERDICT r3 #2): closures must actually
    # deliver — ATE within 0.3% of path length on the multi-lap run.
    ate_ok = bool(rmse <= max(0.003 * path_len, 0.5))
    return {
        "n_frames": n_frames,
        "ate_ok": ate_ok,
        "fps": round(n_frames / t_proc, 2),
        "render_s": round(t_render, 1),
        "process_s": round(t_proc, 1),
        "ate_rmse_m": round(float(rmse), 3),
        "path_length_m": round(path_len, 1),
        "n_local_maps": rep["n_local_maps"],
        "n_closures": rep["n_closures"],
        "n_pose_graph_optimizations": rep["n_optimizations"],
        "n_ba_runs": rep["n_ba_runs"],
        "n_merged_landmarks": rep["n_merged_landmarks"],
        "reloc_db_rows": engine.relocalizer.n_rows,
        "landmark_table_live_rows": table_rows,
        "landmarks_spawned": rep["n_landmarks"],
        "tracking_breaks": rep["n_track_breaks"],
        "closures_after_map_150": closures_after_150,
        "stage_table": rep["stage_table"],
    }


if __name__ == "__main__":
    import jax
    import json

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.vslam_tpu_jax_cache"),
    )
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    out = run_scale(n_frames=n, verbose=True)
    print(json.dumps(out, indent=2))
