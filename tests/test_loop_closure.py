"""Loop-closure stack tests: relocalizer database search + ICP verification,
landmark merging, and the full engine closing a loop on a circular
trajectory (the reference's role for KITTI-00 closure runs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection, RelocalizationParameters
from vslam_tpu.loop.relocalizer import Relocalizer
from vslam_tpu.mapping import landmarks as lm_mod, merging
from vslam_tpu.mapping.local_maps import LocalMap, WorldMap
from vslam_tpu.ops import camera as cam_ops, lie
from vslam_tpu.system.engine import SlamEngine
from vslam_tpu.eval import trajectory as traj_eval

RNG = np.random.default_rng(17)
CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

def make_local_map(map_id, T_world_kf, slots, xyz_world, desc):
    T_kw = np.linalg.inv(T_world_kf)
    return LocalMap(
        map_id=map_id,
        keyframe_index=map_id * 5,
        T_world_kf=T_world_kf.astype(np.float32),
        landmark_slots=np.asarray(slots, np.int32),
        xyz_kf=(xyz_world @ T_kw[:3, :3].T + T_kw[:3, 3]).astype(np.float32),
        desc=desc,
    )


def test_relocalizer_finds_revisited_place():
    params = RelocalizationParameters(preliminary_minimum_interspace_queries=3,
                                      icp_minimum_number_of_inliers=20)
    reloc = Relocalizer(params, capacity=8192)

    n_lm = 60
    xyz = np.stack([RNG.uniform(-8, 8, n_lm), RNG.uniform(-2, 2, n_lm),
                    RNG.uniform(5, 20, n_lm)], 1).astype(np.float32)
    desc = RNG.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)

    # Maps 0..4: map 0 is the place; 1-3 are elsewhere (distinct landmarks).
    reloc.add_local_map(make_local_map(0, np.eye(4), np.arange(n_lm), xyz, desc))
    for m in range(1, 4):
        other_xyz = xyz + np.array([100.0 * m, 0, 0], np.float32)
        other_desc = RNG.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
        reloc.add_local_map(make_local_map(
            m, np.eye(4), 1000 + m * 100 + np.arange(n_lm), other_xyz, other_desc))

    # Query: revisit of map 0 from a shifted keyframe, a few descriptor bits
    # flipped, slots disjoint (new landmarks for the same scenery).
    xi = np.array([0.3, 0.05, -0.2, 0.02, 0.08, -0.01], np.float32)
    T_revisit = np.asarray(lie.exp_se3(jnp.asarray(xi)))  # true T_world_query
    q_desc = desc.copy()
    q_desc[:, 0] ^= np.uint32(0b111)  # 3-bit noise
    query = make_local_map(9, T_revisit, 5000 + np.arange(n_lm), xyz, q_desc)

    closure = reloc.detect_and_verify(query)
    assert closure is not None
    assert closure.reference_id == 0
    assert closure.inlier_ratio > 0.8
    # Recovered relative transform: T_ref_query should map query-kf coords
    # into ref-kf coords = inv(T_world_ref) @ T_world_query = T_revisit.
    err = np.linalg.norm(closure.T_ref_query[:3, 3] - T_revisit[:3, 3])
    assert err < 0.02


def test_relocalizer_respects_interspace():
    """A map queried immediately after insertion must not match itself."""
    params = RelocalizationParameters(preliminary_minimum_interspace_queries=10)
    reloc = Relocalizer(params, capacity=4096)
    n_lm = 50
    xyz = RNG.uniform(-5, 5, (n_lm, 3)).astype(np.float32) + np.array([0, 0, 10], np.float32)
    desc = RNG.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
    reloc.add_local_map(make_local_map(0, np.eye(4), np.arange(n_lm), xyz, desc))
    query = make_local_map(1, np.eye(4), 100 + np.arange(n_lm), xyz, desc)
    assert reloc.detect_and_verify(query) is None


def test_merge_landmarks():
    table = lm_mod.empty_table(64)
    alloc = lm_mod.SlotAllocator(64)
    slots = alloc.allocate(6)
    xyz = np.array([[0, 0, 10], [0, 0, 10.4], [5, 0, 8], [5, 0.1, 8.1],
                    [9, 9, 9], [1, 2, 3]], np.float32)
    desc = RNG.integers(0, 2**32, (6, 8), dtype=np.uint32)
    table = lm_mod.spawn_landmarks(table, jnp.asarray(slots), jnp.asarray(xyz),
                                   jnp.asarray(desc), jnp.int32(0))
    # give slot1/slot3 more observations weight
    table = table._replace(n_updates=table.n_updates.at[jnp.asarray(slots[:4])].set(
        jnp.asarray([1, 3, 2, 2], jnp.int32)))

    corr = np.array([[slots[0], slots[1]], [slots[2], slots[3]]], np.int32)
    table, remap = merging.merge_landmarks(table, alloc, corr)
    valid = np.asarray(table.valid)
    # Two absorbed, representative = smaller slot id
    assert remap == {slots[1]: slots[0], slots[3]: slots[2]}
    assert not valid[slots[1]] and not valid[slots[3]]
    assert valid[slots[0]] and valid[slots[2]] and valid[slots[4]]
    # Information-weighted position: slot1 had 3x weight of slot0
    merged = np.asarray(table.xyz_w)[slots[0]]
    expect = (xyz[0] * 1 + xyz[1] * 3) / 4
    np.testing.assert_allclose(merged, expect, atol=1e-5)
    assert int(np.asarray(table.n_updates)[slots[0]]) == 4
    # Freed slots are reusable
    new = alloc.allocate(2)
    assert set(new.tolist()) == {slots[1], slots[3]}


@pytest.fixture(scope="module")
def circle_run():
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
    for t in range(n_frames):
        img_l, img_r, _ = synthetic.render_frame(world, t)
        engine.process(img_l, img_r)
    return world, engine


def test_engine_closes_loop(circle_run):
    world, engine = circle_run
    assert len(engine.world_map) >= 5, "keyframes were created"
    assert len(engine.world_map.closures) >= 1, "a loop closure was detected"
    assert engine.n_optimizations >= 1


def test_engine_closed_loop_ate(circle_run):
    world, engine = circle_run
    est = engine.trajectory
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    circumference = 2 * np.pi * 7.0
    assert rmse < 0.03 * circumference, f"ATE {rmse:.3f} m on {circumference:.0f} m loop"


def test_engine_report(circle_run):
    _, engine = circle_run
    rep = engine.report()
    assert rep["total_frames"] == 64
    assert rep["n_local_maps"] == len(engine.world_map)
    assert rep["n_closures"] >= 1
    assert rep["mean_frame_hz"] > 0
