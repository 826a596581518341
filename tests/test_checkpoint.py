"""Checkpoint/resume: a resumed engine must continue tracking seamlessly
and produce the same map statistics as the uninterrupted run."""

import numpy as np
import pytest

from vslam_tpu.io import checkpoint, synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.system.engine import SlamEngine
from vslam_tpu.eval import trajectory as traj_eval

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

def make_cfg():
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.command_line.option_disable_relocalization = True
    return cfg


def test_checkpoint_resume(tmp_path):
    world = synthetic.make_world(CAM, n_frames=16, n_points=2000, seed=51, step=0.4)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(16)]

    # Uninterrupted run.
    full = SlamEngine(CAM, make_cfg(), landmark_capacity=8192)
    for f in frames:
        full.process(*f)

    # Interrupted at frame 8, checkpointed, resumed in a NEW engine.
    first = SlamEngine(CAM, make_cfg(), landmark_capacity=8192)
    for f in frames[:8]:
        first.process(*f)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_checkpoint(first, ckpt)

    resumed = SlamEngine(CAM, make_cfg(), landmark_capacity=8192)
    checkpoint.load_checkpoint(resumed, ckpt)
    assert resumed.tracker.frame_idx == 8
    assert resumed.tracker.allocator.num_allocated == first.tracker.allocator.num_allocated
    np.testing.assert_allclose(resumed.tracker.T_world_cam, first.tracker.T_world_cam)
    for f in frames[8:]:
        resumed.process(*f)

    # The resumed trajectory must stay close to the uninterrupted one
    # (first post-resume frame re-seeds tracking, so allow small slack).
    est_full = full.trajectory
    est_res = resumed.trajectory
    assert len(est_res) == len(est_full) == 16
    err = np.linalg.norm(est_full[:, :3, 3] - est_res[:, :3, 3], axis=1)
    assert err.max() < 0.2, err
    rmse, _, _ = traj_eval.ate_rmse(est_res, world.poses)
    assert rmse < 0.1

    # Map state survived: local maps and relocalizer database rebuilt.
    assert len(resumed.world_map) >= len(first.world_map)
    assert resumed.relocalizer.n_rows >= 0


def test_checkpoint_capacity_mismatch(tmp_path):
    world = synthetic.make_world(CAM, n_frames=3, n_points=800, seed=52)
    eng = SlamEngine(CAM, make_cfg(), landmark_capacity=8192)
    for t in range(3):
        eng.process(*synthetic.render_frame(world, t)[:2])
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save_checkpoint(eng, ckpt)
    other = SlamEngine(CAM, make_cfg(), landmark_capacity=4096)
    with pytest.raises(AssertionError):
        checkpoint.load_checkpoint(other, ckpt)
