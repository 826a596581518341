"""Distributed-path tests on the 8-virtual-device CPU mesh (the standard
no-cluster multi-host harness, SURVEY.md §4): sharded Schur BA must agree
with the single-device solver; sharded Hamming search with brute force."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vslam_tpu.backend import ba as ba_mod
from vslam_tpu.parallel import mesh as mesh_mod
from vslam_tpu.parallel import sharded_ba, sharded_search
from vslam_tpu.ops import hamming

from test_backend import make_ba_problem, CAM

from vslam_tpu.ops import camera as cam_ops

# Engine-scale camera for the closed-loop mesh-invariance test.
CAM_E = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                            baseline_m=0.4, rows=320, cols=640)

RNG = np.random.default_rng(13)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_ba_matches_single_device():
    prob, T_gt, xyz_gt = make_ba_problem(P=5, L=128, Omax=5)
    cfg = ba_mod.BAConfig(iterations=8)
    mesh = mesh_mod.make_mesh()

    T_single, xyz_single, chi_single = ba_mod.bundle_adjust(CAM, prob, cfg)
    T_shard, xyz_shard, chi_shard = sharded_ba.bundle_adjust_sharded(
        CAM, prob, mesh, cfg
    )
    # psum reduction order differs from the single-device einsum order, so
    # agreement is to f32 reduction tolerance, not bit-exact.
    np.testing.assert_allclose(np.asarray(T_shard), np.asarray(T_single),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(xyz_shard), np.asarray(xyz_single),
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(chi_shard), np.asarray(chi_single),
                               rtol=1e-2)


def test_sharded_ba_converges():
    prob, T_gt, xyz_gt = make_ba_problem(P=5, L=128, Omax=5)
    cfg = ba_mod.BAConfig(iterations=12)
    mesh = mesh_mod.make_mesh()
    T_out, xyz_out, chi2s = sharded_ba.bundle_adjust_sharded(CAM, prob, mesh, cfg)
    pose_err = np.linalg.norm(np.asarray(T_out)[:, :3, 3] - T_gt[:, :3, 3], axis=1)
    assert pose_err.max() < 0.02
    chi2s = np.asarray(chi2s)
    assert chi2s[-1] < 1e-2 * chi2s[0]


def test_sharded_search_matches_bruteforce():
    D, Q = 1024, 64
    db = RNG.integers(0, 2**32, size=(D, 8), dtype=np.uint32)
    q = db[RNG.choice(D, Q, replace=False)].copy()
    # Flip a few bits so matches are near but not exact.
    q[: Q // 2, 0] ^= np.uint32(0b1011)
    valid = np.ones(D, bool)
    valid[100:120] = False

    mesh = mesh_mod.make_mesh()
    idx, dist = sharded_search.search_sharded(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(valid), mesh
    )
    # Brute force oracle
    full = np.array(hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db)))
    full[:, ~valid] = 1 << 20
    oracle_idx = full.argmin(1)
    oracle_dist = full.min(1)
    np.testing.assert_array_equal(np.asarray(dist), oracle_dist)
    # Ties can resolve to different indices; require equal distance at the
    # chosen index instead of identical index.
    chosen = full[np.arange(Q), np.asarray(idx)]
    np.testing.assert_array_equal(chosen, oracle_dist)


def test_sharded_search_popcount_path():
    D, Q = 256, 16
    db = RNG.integers(0, 2**32, size=(D, 8), dtype=np.uint32)
    q = RNG.integers(0, 2**32, size=(Q, 8), dtype=np.uint32)
    mesh = mesh_mod.make_mesh()
    idx_a, dist_a = sharded_search.search_sharded(
        jnp.asarray(q), jnp.asarray(db), jnp.ones(D, bool), mesh, use_mxu=True
    )
    idx_b, dist_b = sharded_search.search_sharded(
        jnp.asarray(q), jnp.asarray(db), jnp.ones(D, bool), mesh, use_mxu=False
    )
    np.testing.assert_array_equal(np.asarray(dist_a), np.asarray(dist_b))


def test_sharded_top2_matches_bruteforce():
    """search_sharded_top2 (the live Relocalizer's query) returns the exact
    global best and second-best distances, including when a whole shard is
    masked out (the int32 packing must survive the masked sentinel)."""
    D, Q = 512, 32
    db = RNG.integers(0, 2**32, size=(D, 8), dtype=np.uint32)
    q = db[RNG.choice(D, Q, replace=False)].copy()
    q[: Q // 2, 1] ^= np.uint32(0b111)
    valid = np.ones(D, bool)
    valid[: D // 8] = False  # mask exactly one shard of the 8-device mesh

    mesh = mesh_mod.make_mesh()
    idx, d1, d2 = sharded_search.search_sharded_top2(
        jnp.asarray(q), jnp.asarray(db), jnp.asarray(valid), mesh
    )
    full = np.array(hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(db)))
    full[:, ~valid] = 511
    part = np.sort(full, axis=1)
    np.testing.assert_array_equal(np.asarray(d1), part[:, 0])
    np.testing.assert_array_equal(np.asarray(d2), part[:, 1])
    chosen = full[np.arange(Q), np.asarray(idx)]
    np.testing.assert_array_equal(chosen, part[:, 0])


def test_sharded_top2_all_masked():
    """Fully-masked database: sentinel distances, no crash, no bogus ok."""
    D, Q = 256, 8
    db = RNG.integers(0, 2**32, size=(D, 8), dtype=np.uint32)
    mesh = mesh_mod.make_mesh()
    idx, d1, d2 = sharded_search.search_sharded_top2(
        jnp.asarray(db[:Q]), jnp.asarray(db), jnp.zeros(D, bool), mesh
    )
    assert int(np.asarray(d1).min()) == 511
    assert int(np.asarray(d2).min()) == 511


@pytest.mark.slow
def test_engine_closed_loop_mesh_invariance():
    """A closed-loop engine run on the 8-virtual-device mesh (sharded
    descriptor DB + sharded landmarks, the >1-device default) produces
    the same trajectory as the explicitly-unsharded run — closures fire
    in both and corrections agree to f32 tolerance (VERDICT r4 #7:
    sharding must be a pure execution detail, never a semantics change).
    """
    from vslam_tpu.io import synthetic
    from vslam_tpu.io.config import ParameterCollection
    from vslam_tpu.system.engine import SlamEngine
    from vslam_tpu.eval import trajectory as traj_eval

    def make_cfg(sharded: bool):
        cfg = ParameterCollection()
        cfg.framepoint_generation.capacity = 512
        cfg.framepoint_generation.bin_size_pixels = 12
        cfg.world_map.minimum_distance_traveled_for_local_map = 0.8
        cfg.world_map.minimum_number_of_frames_for_local_map = 2
        cfg.relocalization.preliminary_minimum_interspace_queries = 6
        cfg.relocalization.preliminary_minimum_matching_ratio = 0.08
        cfg.relocalization.icp_minimum_number_of_inliers = 8
        cfg.relocalization.icp_minimum_inlier_ratio = 0.3
        cfg.graph_optimization.enable_full_bundle_adjustment = True
        cfg.graph_optimization.number_of_frames_per_bundle_adjustment = 24
        cfg.parallelism.shard_descriptor_db = sharded
        cfg.parallelism.shard_landmarks = sharded
        return cfg

    n_frames = 64
    poses = synthetic.circle_trajectory(n_frames, radius=7.0)
    world = synthetic.make_world(CAM_E, n_points=2200, seed=21, poses=poses)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(n_frames)]

    trajs, reports = [], []
    for sharded in (False, True):
        engine = SlamEngine(CAM_E, make_cfg(sharded), landmark_capacity=32768)
        if sharded:
            assert engine.mesh is not None and engine.mesh.size == 8
        else:
            assert engine.mesh is None
        for img_l, img_r in frames:
            engine.process(img_l, img_r)
        trajs.append(engine.trajectory)
        reports.append(engine.report())

    for rep in reports:
        assert rep["n_closures"] >= 1, rep
        assert rep["n_optimizations"] >= 1, rep
        assert rep["n_ba_runs"] >= 1, rep
    # Same closure structure and trajectory to f32 tolerance.
    assert reports[0]["n_local_maps"] == reports[1]["n_local_maps"]
    d = np.linalg.norm(
        trajs[0][:, :3, 3] - trajs[1][:, :3, 3], axis=1
    )
    assert d.max() < 1e-2, d.max()
    rmse0, _, _ = traj_eval.ate_rmse(trajs[0], world.poses)
    rmse1, _, _ = traj_eval.ate_rmse(trajs[1], world.poses)
    assert abs(rmse0 - rmse1) < 1e-3, (rmse0, rmse1)
