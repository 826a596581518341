"""Landmark recovery (reference recoverPoints,
stereo_framepoint_generator.cpp:683-869): landmark-backed points that the
detector loses are re-acquired at their solved-pose projections, measurably
lengthening tracks."""

import numpy as np
import pytest

from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.tracking import fused
from vslam_tpu.tracking.tracker import FusedPoseTracker

CAM = cam_ops.make_camera(fx=400.0, fy=400.0, cx=160.0, cy=80.0,
                          baseline_m=0.3, rows=160, cols=320)



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

def run_tracker(enable_recovery: bool, frames):
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 256
    cfg.framepoint_generation.bin_size_pixels = 10
    cfg.command_line.option_recover_landmarks = enable_recovery
    tracker = FusedPoseTracker(CAM, cfg, landmark_capacity=8192)
    for l, r in frames:
        tracker.compute(l, r)
    tracker.flush()
    return tracker


@pytest.fixture(scope="module")
def frames():
    # A busy world: per-cell argmax binning makes detection flicker between
    # rival corners, so landmark-backed points regularly go undetected for
    # a frame — exactly what recovery repairs.
    world = synthetic.make_world(CAM, n_frames=30, n_points=4000, seed=3,
                                 step=0.35)
    return [synthetic.render_frame(world, t)[:2] for t in range(30)], world


def test_recovery_reacquires_lost_landmarks(frames):
    fs, world = frames
    with_rec = run_tracker(True, fs)
    assert with_rec.stats.n_recovered > 20, with_rec.stats.n_recovered
    assert with_rec.stats.n_breaks == 0


def test_recovery_lengthens_tracks(frames):
    fs, world = frames
    with_rec = run_tracker(True, fs)
    without = run_tracker(False, fs)
    # Recovered observations feed landmark updates: mean update count
    # (track length proxy) must be measurably higher with recovery.
    def mean_updates(tr):
        t = tr.state.table
        v = np.asarray(t.valid)
        return float(np.asarray(t.n_updates)[v].mean())

    m_rec, m_no = mean_updates(with_rec), mean_updates(without)
    assert m_rec > m_no * 1.05, (m_rec, m_no)
    # And the pose estimate must not degrade.
    from vslam_tpu.eval import trajectory as traj_eval

    rmse_rec, _, _ = traj_eval.ate_rmse(
        np.stack(with_rec.trajectory), world.poses
    )
    rmse_no, _, _ = traj_eval.ate_rmse(
        np.stack(without.trajectory), world.poses
    )
    assert rmse_rec < max(rmse_no * 1.5, 0.05)
