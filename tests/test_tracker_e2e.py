"""End-to-end open-loop odometry on a synthetic stereo sequence with an
asserted ATE bound — the metric-gated version of the reference's
completion-gated KITTI regression runs (.github/workflows/run_app_00.yml)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.tracking.tracker import PoseTracker, TRACKING
from vslam_tpu.eval import trajectory as traj_eval

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def synthetic_run():
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.framepoint_generation.detector_threshold_starting_value = 25.0
    world = synthetic.make_world(CAM, n_frames=30, n_points=3000, seed=9,
                                 step=0.4, turn_rate=0.003)
    tracker = PoseTracker(CAM, cfg, landmark_capacity=16384)
    for t in range(len(world.poses)):
        img_l, img_r, _ = synthetic.render_frame(world, t)
        tracker.compute(img_l, img_r)
    return world, tracker


def test_tracker_follows_trajectory(synthetic_run):
    world, tracker = synthetic_run
    est = np.stack(tracker.trajectory)
    gt = world.poses
    assert len(est) == len(gt)
    rmse, _, raw = traj_eval.ate_rmse(est, gt)
    total_len = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    # Open-loop visual odometry on clean synthetic data: ATE well under
    # 2% of trajectory length.
    assert rmse < 0.02 * total_len, f"ATE {rmse:.3f} m over {total_len:.1f} m"


def test_tracker_reaches_tracking_state(synthetic_run):
    _, tracker = synthetic_run
    assert tracker.status == TRACKING
    assert tracker.stats.n_breaks == 0
    assert tracker.allocator.num_allocated > 100


def test_landmarks_near_world_points(synthetic_run):
    world, tracker = synthetic_run
    table = tracker.table
    valid = np.asarray(table.valid) & (np.asarray(table.n_updates) >= 3)
    xyz = np.asarray(table.xyz_w)[valid]
    assert len(xyz) > 50
    # Each mature landmark should sit near some true world point.
    d = np.min(
        np.linalg.norm(xyz[:, None, :] - world.points_w[None, :, :], axis=2), axis=1
    )
    # Stereo depth quantization at this geometry is z^2/(f*b) ~ 4.5 m/px at
    # z=30 m with integer-pixel detection, so sub-meter median is already
    # sub-pixel-accurate triangulation on average.
    assert np.median(d) < 1.0


def test_rpe_small(synthetic_run):
    world, tracker = synthetic_run
    est = np.stack(tracker.trajectory)
    t_rmse, r_rmse = traj_eval.rpe(est, world.poses.astype(np.float64))
    assert t_rmse < 0.05  # meters per frame step
    assert r_rmse < 0.01  # radians per frame step
