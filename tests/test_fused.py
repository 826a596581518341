"""Fused single-dispatch tracker: equivalence with the modular reference
path and end-to-end quality."""

import numpy as np
import pytest

from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.tracking.tracker import FusedPoseTracker, PoseTracker
from vslam_tpu.eval import trajectory as traj_eval

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)


def make_cfg():
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    return cfg


@pytest.fixture(scope="module")
def runs():
    world = synthetic.make_world(CAM, n_frames=20, n_points=2200, seed=61, step=0.4)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(20)]
    fused = FusedPoseTracker(CAM, make_cfg(), landmark_capacity=16384)
    modular = PoseTracker(CAM, make_cfg(), landmark_capacity=16384)
    for f in frames:
        fused.compute(*f)
        modular.compute(*f)
    fused.flush()  # drain the pipelined readback
    return world, fused, modular


def test_fused_tracks_accurately(runs):
    world, fused, modular = runs
    est = np.stack(fused.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    total = np.sum(np.linalg.norm(np.diff(world.poses[:, :3, 3], axis=0), axis=1))
    assert fused.stats.n_breaks == 0
    assert rmse < 0.02 * total


def test_fused_close_to_modular(runs):
    """Same kernels, same data -> trajectories agree closely (not bitwise:
    the retry ladder and threshold controller differ in rounding details)."""
    world, fused, modular = runs
    ef = np.stack(fused.trajectory)
    em = np.stack(modular.trajectory)
    d = np.linalg.norm(ef[:, :3, 3] - em[:, :3, 3], axis=1)
    assert d.max() < 0.1, d


def test_fused_landmark_table_populates(runs):
    _, fused, _ = runs
    assert fused.allocator.num_allocated > 200
    valid = np.asarray(fused.table.valid)
    assert valid.sum() == fused.allocator.num_allocated


def test_fused_interface_parity(runs):
    """Engine-facing surface behaves like the modular tracker."""
    _, fused, _ = runs
    assert fused.frame_idx == 20
    assert fused.T_world_cam.shape == (4, 4)
    assert fused.prev_frame.uv4.shape[0] == 512
    fused.T_world_cam = np.eye(4, dtype=np.float32)
    np.testing.assert_array_equal(fused.T_world_cam, np.eye(4))
