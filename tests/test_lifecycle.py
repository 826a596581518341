"""Map lifecycle at scale (reference framepoint dropping / landmark
pruning, world_map.cpp:141-160): the landmark table recycles stale
unprotected slots through the device free-list instead of silently
saturating, and the relocalizer database grows past its initial capacity
instead of silently dropping local maps."""

import numpy as np
import jax.numpy as jnp
import pytest

from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection, RelocalizationParameters
from vslam_tpu.loop.relocalizer import Relocalizer
from vslam_tpu.mapping.local_maps import LocalMap
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.tracking.tracker import FusedPoseTracker

RNG = np.random.default_rng(31)
CAM = cam_ops.make_camera(fx=300.0, fy=300.0, cx=160.0, cy=80.0,
                          baseline_m=0.3, rows=160, cols=320)


def test_landmark_eviction_recycles_slots():
    """A tiny landmark table on a long run: without recycling it saturates
    and new landmarks silently drop; with eviction the free-list refills
    and spawning continues to the end."""
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 256
    cfg.framepoint_generation.bin_size_pixels = 10
    # Aggressive lifecycle so the effect shows within a short run.
    tracker = FusedPoseTracker(CAM, cfg, landmark_capacity=1024)
    params = tracker.params._replace(
        evict_every=8, evict_age_frames=10, evict_max_updates=4
    )
    from vslam_tpu.tracking import fused

    tracker.params = params
    tracker._step = fused.make_frame_step(params)

    world = synthetic.make_world(
        CAM, n_frames=90, n_points=6000, seed=13, step=1.2
    )
    spawned_by_60 = 0
    for t in range(90):
        img_l, img_r, _ = synthetic.render_frame(world, t)
        tracker.compute(img_l, img_r)
        if t == 60:
            tracker.flush()
            spawned_by_60 = tracker.stats.n_spawned
    tracker.flush()
    st = tracker.state
    # More landmarks were CREATED over the run than the table can hold —
    # only possible because eviction recycles slots.
    assert tracker.stats.n_spawned > 1024, tracker.stats.n_spawned
    # Spawning did not stall near the end (no silent saturation).
    assert tracker.stats.n_spawned > spawned_by_60 + 100
    valid = int(np.asarray(st.table.valid).sum())
    assert valid <= 1024
    # Eviction actually invalidated stale slots at some point.
    assert valid + int(st.free_count) <= 1024
    assert int(st.free_count) > 0 or int(st.next_slot) < 1024


def make_local_map(map_id, n_lm=40):
    xyz = RNG.uniform(-5, 5, (n_lm, 3)).astype(np.float32)
    desc = RNG.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
    return LocalMap(
        map_id=map_id,
        keyframe_index=map_id * 3,
        T_world_kf=np.eye(4, dtype=np.float32),
        landmark_slots=np.arange(n_lm, dtype=np.int32) + map_id * 100,
        xyz_kf=xyz,
        desc=desc,
    )


def test_relocalizer_database_grows():
    """Round-1 bug: the DB silently stopped accepting local maps at
    capacity.  Now it doubles (with a warning) and keeps answering."""
    params = RelocalizationParameters()
    reloc = Relocalizer(params, capacity=1024)
    n_inserted = 0
    for m in range(40):
        reloc.add_local_map(make_local_map(m))
        n_inserted += 40  # all slots distinct across maps -> all rows fresh
    assert reloc.capacity > 1024, "database grew"
    assert reloc.n_rows == n_inserted, "no local map was dropped"
    assert len(reloc.maps) == 40
    # Rows of an early map are still queryable after growth.
    q = make_local_map(99)
    q.desc = reloc.maps[0].desc.copy()
    closure_or_none = reloc.detect_and_verify(q)
    # (geometric verify may fail on random xyz; the point is no crash and
    # the early rows are still matched at distance 0)
    import jax.numpy as jnp
    from vslam_tpu.loop.relocalizer import _query_database

    qd = np.zeros((reloc.QUERY_CAP, 8), np.uint32)
    qd[:40] = q.desc[:40]
    idx, ok, dist = _query_database(
        jnp.asarray(qd), reloc.db_desc, reloc.db_map_id,
        jnp.int32(89), jnp.int32(45), jnp.int32(0),
    )
    assert int(np.asarray(dist)[:40].min()) == 0
    db_map_id = np.asarray(reloc.db_map_id)
    assert db_map_id[int(np.asarray(idx)[0])] == 0


def test_spawn_and_update_matches_split_pair():
    """The fused single-pass table op must equal spawn_landmarks followed
    by update_observed exactly (same rows, same values)."""
    import jax.numpy as jnp

    from vslam_tpu.mapping import landmarks as lm_mod
    from vslam_tpu.ops import camera as cam_ops, lie

    cam = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                              baseline_m=0.4, rows=320, cols=640)
    rng = np.random.default_rng(3)
    M, K = 256, 64
    table = lm_mod.empty_table(M)
    # Pre-populate some landmarks.
    pre = rng.choice(M, 40, replace=False).astype(np.int32)
    xyz0 = rng.uniform(-5, 5, (40, 3)).astype(np.float32)
    xyz0[:, 2] = rng.uniform(5, 20, 40)
    slots_pre = np.full(K, -1, np.int32)
    slots_pre[:40] = pre
    xyz_pre = np.zeros((K, 3), np.float32)
    xyz_pre[:40] = xyz0
    desc_pre = rng.integers(0, 2**32, (K, 8), dtype=np.uint64).astype(np.uint32)
    table = lm_mod.spawn_landmarks(
        table, jnp.asarray(slots_pre), jnp.asarray(xyz_pre),
        jnp.asarray(desc_pre), jnp.int32(0), origin_kf=jnp.int32(0))

    # A frame observing 30 existing + spawning 20 fresh.
    T_wc = np.eye(4, dtype=np.float32)
    T_wc[:3, 3] = [0.2, 0.0, 0.1]
    slot = np.full(K, -1, np.int32)
    fresh = np.zeros(K, bool)
    slot[:30] = pre[:30]
    fresh_rows = np.arange(30, 50)
    fresh_slots = np.setdiff1d(np.arange(M), pre)[:20]
    slot[fresh_rows] = fresh_slots
    fresh[fresh_rows] = True
    p_cam = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    p_cam[:, 2] = rng.uniform(4, 15, K)
    # Observations = projections of current estimates (small residuals).
    T_cw = np.asarray(lie.inverse(jnp.asarray(T_wc)))
    xyz_w_obs = np.zeros((K, 3), np.float32)
    xyz_w_obs[:30] = xyz0[:30]
    xyz_w_obs[30:50] = (T_wc[:3, :3] @ p_cam[30:50].T).T + T_wc[:3, 3]
    pc = (T_cw[:3, :3] @ xyz_w_obs.T).T + T_cw[:3, 3]
    uv_l, uv_r, _ = cam_ops.project_stereo(cam, jnp.asarray(pc))
    uv4 = np.concatenate([np.asarray(uv_l), np.asarray(uv_r)], 1).astype(np.float32)
    uv4 += rng.normal(0, 0.3, uv4.shape).astype(np.float32)
    desc = rng.integers(0, 2**32, (K, 8), dtype=np.uint64).astype(np.uint32)
    valid = np.zeros(K, bool)
    valid[:50] = True

    kw = dict(mode="stereo", min_forced_updates=2, min_meas_for_opt=2,
              max_t_err_depth_ratio=1.0)
    # Split pair.
    xyz_w_spawn = np.asarray(
        lie.transform_point_cloud(jnp.asarray(T_wc), jnp.asarray(p_cam)))
    t_split = lm_mod.spawn_landmarks(
        table, jnp.asarray(np.where(fresh, slot, -1)),
        jnp.asarray(xyz_w_spawn), jnp.asarray(desc), jnp.int32(7),
        origin_kf=jnp.int32(3))
    t_split = lm_mod.update_observed(
        cam, t_split, jnp.asarray(T_wc), jnp.asarray(slot),
        jnp.asarray(uv4), jnp.asarray(desc), jnp.asarray(valid),
        jnp.int32(7), **kw)
    # Fused op.
    t_fused = lm_mod.spawn_and_update_observed(
        cam, table, jnp.asarray(T_wc), jnp.asarray(slot),
        jnp.asarray(fresh), jnp.asarray(p_cam), jnp.asarray(uv4),
        jnp.asarray(desc), jnp.asarray(valid), jnp.int32(7),
        origin_kf=jnp.int32(3), **kw)

    for f in t_split._fields:
        a, b = np.asarray(getattr(t_split, f)), np.asarray(getattr(t_fused, f))
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, atol=1e-4, err_msg=f)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)
