"""RGB-D mode tests: depth registration kernel, depth front-end, and
end-to-end RGB-D odometry (the reference's TUM/ICL configurations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vslam_tpu.frontend import depth as depth_mod
from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.tracking.tracker import PoseTracker, TRACKING
from vslam_tpu.eval import trajectory as traj_eval

RNG = np.random.default_rng(23)
CAM = cam_ops.make_camera(fx=525.0, fy=525.0, cx=320.0, cy=160.0,
                          baseline_m=0.075, rows=320, cols=640)



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

def test_gather_depth():
    d = np.zeros((100, 200), np.float32)
    d[40, 60] = 3.5
    d[10, 190] = 1.25
    uv = jnp.asarray(np.array([[60.2, 39.8], [189.7, 10.1], [0, 0]], np.float32))
    z = np.asarray(depth_mod.gather_depth(jnp.asarray(d), uv))
    np.testing.assert_allclose(z, [3.5, 1.25, 0.0])


def test_register_depth_identity():
    """Depth camera == RGB camera: registration is identity up to rounding."""
    d = np.zeros((320, 640), np.float32)
    d[100:110, 200:210] = 4.0
    out = np.asarray(depth_mod.register_depth(
        CAM, jnp.asarray(d), CAM.K, jnp.eye(4)))
    np.testing.assert_allclose(out[104, 204], 4.0, atol=1e-5)
    assert np.count_nonzero(out) >= 80  # most of the block survives rounding


def test_register_depth_translated_camera():
    """A depth camera shifted along x reprojects depth into shifted pixels
    with correct z-buffer behaviour."""
    d = np.zeros((320, 640), np.float32)
    d[150:170, 300:320] = 2.0
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.1  # depth camera origin at x=-0.1 in rgb frame -> shift right
    out = np.asarray(depth_mod.register_depth(CAM, jnp.asarray(d), CAM.K, jnp.asarray(T)))
    # Expected shift: fx * 0.1 / 2.0 = 26.25 px in +u
    nz = np.argwhere(out > 0)
    assert len(nz) > 100
    assert abs(nz[:, 1].mean() - (309.5 + 26.25)) < 2.0
    np.testing.assert_allclose(out[nz[:, 0], nz[:, 1]], 2.0, atol=1e-3)


@pytest.fixture(scope="module")
def rgbd_run():
    cfg = ParameterCollection()
    cfg.command_line.tracker_mode = "RGB_DEPTH"
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.framepoint_generation.maximum_depth_meters = 30.0
    world = synthetic.make_world(CAM, n_frames=25, n_points=2500, seed=31,
                                 step=0.3, turn_rate=0.003)
    tracker = PoseTracker(CAM, cfg, landmark_capacity=16384)
    for t in range(len(world.poses)):
        img, depth = synthetic.render_depth_frame(world, t)
        tracker.compute(img, depth)
    return world, tracker


def test_rgbd_odometry_ate(rgbd_run):
    world, tracker = rgbd_run
    est = np.stack(tracker.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    total_len = np.sum(np.linalg.norm(np.diff(world.poses[:, :3, 3], axis=0), axis=1))
    assert tracker.status == TRACKING
    assert rmse < 0.03 * total_len, f"ATE {rmse:.3f} m over {total_len:.1f} m"


def test_rgbd_landmarks(rgbd_run):
    world, tracker = rgbd_run
    assert tracker.allocator.num_allocated > 100
    valid = np.asarray(tracker.table.valid) & (np.asarray(tracker.table.n_updates) >= 3)
    xyz = np.asarray(tracker.table.xyz_w)[valid]
    assert len(xyz) > 30
    d = np.min(np.linalg.norm(xyz[:, None, :] - world.points_w[None, :, :], axis=2), axis=1)
    assert np.median(d) < 0.5


def test_rgbd_landmark_recovery():
    """Depth-mode recoverPoints parity (reference
    depth_framepoint_generator.cpp:300-408): lost landmark-backed points
    re-acquired from the dense descriptor planes + registered depth map."""
    from vslam_tpu.tracking.tracker import FusedPoseTracker

    cfg = ParameterCollection()
    cfg.command_line.tracker_mode = "RGB_DEPTH"
    cfg.framepoint_generation.capacity = 256
    cfg.framepoint_generation.bin_size_pixels = 10
    cfg.framepoint_generation.maximum_depth_meters = 30.0
    world = synthetic.make_world(CAM, n_frames=25, n_points=4000, seed=7,
                                 step=0.3)

    def run(recover):
        cfg.command_line.option_recover_landmarks = recover
        tr = FusedPoseTracker(CAM, cfg, landmark_capacity=8192)
        for t in range(25):
            img, depth = synthetic.render_depth_frame(world, t)
            tr.compute(img, depth)
        tr.flush()
        return tr

    with_rec = run(True)
    without = run(False)
    assert with_rec.stats.n_recovered > 20, with_rec.stats.n_recovered

    def mean_updates(tr):
        t = tr.state.table
        v = np.asarray(t.valid)
        return float(np.asarray(t.n_updates)[v].mean())

    # Depth-mode detection is steadier than stereo (no right-image match to
    # lose) so the track-length lift is small but must be real.
    assert mean_updates(with_rec) > mean_updates(without)


def test_rgbd_misaligned_depth_sensor_end_to_end():
    """A depth camera mounted 6 cm to the LEFT of the RGB camera: the
    tracker registers every depth image through the configured calibration
    (reference _computeDepthMap runs per frame) and odometry still works."""
    from vslam_tpu.ops import lie as lie_mod
    from vslam_tpu.tracking.tracker import FusedPoseTracker

    T_rgb_depth = np.eye(4, dtype=np.float32)
    T_rgb_depth[0, 3] = -0.06  # depth origin at x=-6cm in the RGB frame

    world = synthetic.make_world(CAM, n_frames=15, n_points=2500, seed=11,
                                 step=0.3)
    # Render the depth stream from the DEPTH camera's poses.
    depth_world = synthetic.SyntheticWorld(
        cam=world.cam, points_w=world.points_w, textures=world.textures,
        poses=np.asarray([p @ T_rgb_depth for p in world.poses], np.float32),
        background=world.background, patch=world.patch,
    )

    cfg = ParameterCollection()
    cfg.command_line.tracker_mode = "RGB_DEPTH"
    cfg.framepoint_generation.capacity = 256
    cfg.framepoint_generation.bin_size_pixels = 10
    cfg.framepoint_generation.maximum_depth_meters = 30.0
    cfg.framepoint_generation.depth_camera_intrinsics = np.asarray(CAM.K).tolist()
    cfg.framepoint_generation.depth_camera_to_rgb = T_rgb_depth.tolist()

    tr = FusedPoseTracker(CAM, cfg, landmark_capacity=8192)
    for t in range(15):
        img, _ = synthetic.render_depth_frame(world, t)
        _, depth = synthetic.render_depth_frame(depth_world, t)
        tr.compute(img, depth)
    tr.flush()
    est = np.stack(tr.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    total = np.sum(np.linalg.norm(np.diff(world.poses[:, :3, 3], axis=0), axis=1))
    assert tr.stats.n_breaks == 0
    assert rmse < 0.05 * total, f"ATE {rmse:.3f} m over {total:.1f} m"


def test_bilateral_depth_filter_preserves_edges():
    """Reference bilateral-filter option (depth_framepoint_generator.cpp:
    415-421): smooths within surfaces, does not smear across depth
    discontinuities, leaves invalid (0) pixels invalid."""
    import jax.numpy as jnp

    from vslam_tpu.frontend.depth import bilateral_filter_depth

    rng = np.random.default_rng(0)
    d = np.zeros((40, 40), np.float32)
    d[5:35, 5:35] = 2.0 + rng.normal(0, 0.01, (30, 30))
    d[15:25, 15:25] = 5.0 + rng.normal(0, 0.01, (10, 10))
    out = np.asarray(bilateral_filter_depth(jnp.asarray(d)))
    assert out[0, 0] == 0.0
    assert abs(out[20, 20] - 5.0) < 0.05
    assert abs(out[10, 10] - 2.0) < 0.05
    # In-surface noise is reduced.
    inner = slice(7, 13)
    assert out[inner, inner].std() <= d[inner, inner].std() + 1e-6
