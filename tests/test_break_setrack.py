"""breakTrack / setTrack parity (reference world_map.cpp:260-303): a forced
tracking gap re-roots the track (dead-reckoned, counted, odometry edge
downweighted) and a later loop closure reattaches the broken segment into a
consistent global trajectory."""

import numpy as np
import pytest

from vslam_tpu.eval import trajectory as traj_eval
from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.system.engine import SlamEngine, BREAK_EDGE_WEIGHT

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)

BLANK = 18  # frame where the camera is blinded for one frame



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def gap_run():
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.world_map.minimum_distance_traveled_for_local_map = 0.8
    cfg.world_map.minimum_number_of_frames_for_local_map = 2
    cfg.relocalization.preliminary_minimum_interspace_queries = 6
    cfg.relocalization.preliminary_minimum_matching_ratio = 0.08
    cfg.relocalization.icp_minimum_number_of_inliers = 8
    cfg.relocalization.icp_minimum_inlier_ratio = 0.3

    n_frames = 64
    poses = synthetic.circle_trajectory(n_frames, radius=7.0)
    world = synthetic.make_world(CAM, n_points=2200, seed=21, poses=poses)
    engine = SlamEngine(CAM, cfg, landmark_capacity=32768)
    blank = np.zeros((CAM.rows, CAM.cols), np.float32)
    for t in range(n_frames):
        img_l, img_r, _ = synthetic.render_frame(world, t)
        if t == BLANK:
            img_l, img_r = blank, blank  # blind the camera: forced break
        engine.process(img_l, img_r)
    engine._flush_tracker()
    return world, engine


def test_gap_breaks_track(gap_run):
    _, engine = gap_run
    # The blank frame (and the re-acquisition frame after it) break tracking.
    assert engine.tracker.stats.n_breaks >= 1
    assert len(engine.tracker._break_frames) >= 1


def test_break_downweights_odometry_edge(gap_run):
    _, engine = gap_run
    assert any(w == BREAK_EDGE_WEIGHT for w in engine.kf_odom_weight), (
        engine.kf_odom_weight
    )


def test_closure_reattaches_broken_trajectory(gap_run):
    """After the loop closes, the pose graph pulls the broken segment back
    into a globally consistent trajectory (setTrack parity)."""
    world, engine = gap_run
    assert len(engine.world_map.closures) >= 1, "loop closure must fire"
    assert engine.n_optimizations >= 1
    est = np.stack(engine.tracker.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    circumference = 2 * np.pi * 7.0
    # Dead-reckoning across the gap alone would leave a large inconsistency;
    # the closure-constrained graph keeps the WHOLE trajectory tight.
    assert rmse < 0.05 * circumference, rmse
