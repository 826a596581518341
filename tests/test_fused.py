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



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

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


def test_localizing_appearance_matching():
    """In the Localizing state the first track attempt matches by
    appearance (projection-free), so a viewpoint jump far beyond the
    search window still re-acquires tracks (reference track_by_appearance,
    pose_tracker_3d.cpp:87-92,227-239)."""
    import jax.numpy as jnp

    from vslam_tpu.mapping import frame as frame_mod
    from vslam_tpu.tracking import fused as fused_mod

    # A genuinely large viewpoint change: a 20-degree yaw displaces every
    # projection by ~fx*tan(20°) ≈ 180 px — beyond radius_max even under
    # an identity guess, so the windowed retry ladder cannot re-acquire,
    # but the projection-free appearance match can (and the view overlap
    # stays large).
    poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    a = np.deg2rad(20.0)
    poses[1][:3, :3] = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float32,
    )
    world = synthetic.make_world(CAM, n_points=2600, seed=7, poses=poses)
    img0 = synthetic.render_frame(world, 0)[:2]
    img1 = synthetic.render_frame(world, 1)[:2]

    cfg = make_cfg()
    tracker = FusedPoseTracker(CAM, cfg, landmark_capacity=16384)
    params = tracker.params
    step = fused_mod.make_frame_step(params)

    def run_pair(localizing: bool):
        state = fused_mod.init_state(CAM, params, 16384, 20.0)
        chunk0 = jnp.asarray(np.stack([np.stack(img0)]), jnp.uint8)
        chunk1 = jnp.asarray(np.stack([np.stack(img1)]), jnp.uint8)
        odom = jnp.tile(jnp.eye(4), (1, 1, 1))
        state, _ = step(CAM, state, chunk0, jnp.int32(0),
                        jnp.asarray(False), odom, jnp.asarray(False))
        state = state._replace(localizing=jnp.asarray(localizing))
        state, stats = step(CAM, state, chunk1, jnp.int32(0),
                            jnp.asarray(False), odom, jnp.asarray(False))
        return int(stats.n_inliers), bool(stats.tracking_ok)

    inl_loc, ok_loc = run_pair(True)
    inl_win, ok_win = run_pair(False)
    # The appearance match registers the jump (many inliers); the windowed
    # ladder cannot.
    assert ok_loc and inl_loc > 50, (inl_loc, ok_loc)
    assert not ok_win and inl_loc > 5 * max(inl_win, 1), (inl_loc, inl_win)


def test_chunk_step_matches_per_frame_steps():
    """The one-dispatch-per-chunk program (make_chunk_step fori_loop) is
    EXACTLY the composition of the per-frame fused steps — bitwise on the
    trajectory — including a short tail chunk (dynamic k)."""
    import jax
    import jax.numpy as jnp

    from vslam_tpu.tracking import fused as fused_mod

    n = 10
    world = synthetic.make_world(CAM, n_frames=n, n_points=2200, seed=19,
                                 step=0.4)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(n)]
    cfg = make_cfg()
    tracker = FusedPoseTracker(CAM, cfg, landmark_capacity=16384)
    params = tracker.params
    step = fused_mod.make_frame_step(params)
    chunk_step = fused_mod.make_chunk_step(params)

    C = 4  # chunk capacity; last chunk holds only 2 frames
    chunks = []
    for i in range(0, n, C):
        group = frames[i : i + C]
        buf = np.zeros((C, 2) + group[0][0].shape, np.uint8)
        for j, (l, r) in enumerate(group):
            buf[j] = np.stack([l, r]).astype(np.uint8)
        chunks.append((jnp.asarray(buf), len(group)))

    odom = jnp.tile(jnp.eye(4), (C, 1, 1))
    motion = jnp.asarray(True)
    no_odom = jnp.asarray(False)

    s_ref = fused_mod.init_state(CAM, params, 16384, 20.0)
    for chunk, k in chunks:
        for i in range(k):
            s_ref, _ = step(CAM, s_ref, chunk, jnp.int32(i), motion, odom,
                            no_odom)

    s_chunk = fused_mod.init_state(CAM, params, 16384, 20.0)
    for chunk, k in chunks:
        s_chunk = chunk_step(CAM, s_chunk, chunk, jnp.int32(k), motion,
                             odom, no_odom)

    np.testing.assert_allclose(
        np.asarray(s_chunk.ring), np.asarray(s_ref.ring), rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(s_chunk.kf_n), np.asarray(s_ref.kf_n)
    )
    np.testing.assert_allclose(
        np.asarray(s_chunk.T_world_cam), np.asarray(s_ref.T_world_cam),
        rtol=0, atol=0,
    )
    assert int(s_chunk.frame_idx) == n
