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
