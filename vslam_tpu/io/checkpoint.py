"""Map-state checkpoint / resume.

The reference persists only end-of-run artifacts (trajectories, g2o file —
SURVEY.md §5); production multi-host runs need mid-run durability.  A
checkpoint captures the complete SLAM state: landmark table, allocator,
tracker pose/motion/adaptive state, keyframe local maps, relocalizer
database and pose-graph bookkeeping — as one compressed npz (everything is
already SoA arrays, so orbax machinery is unnecessary; the format is a
stable dict of arrays).
"""

from __future__ import annotations

import json

import numpy as np

from vslam_tpu.mapping import landmarks as lm_mod
from vslam_tpu.mapping.local_maps import LocalMap

FORMAT_VERSION = 2


def save_checkpoint(engine, path: str) -> None:
    import jax.numpy as jnp  # noqa: F401

    tracker = engine.tracker
    if hasattr(tracker, "flush"):
        tracker.flush()  # drain pipelined readback before serializing
    table = tracker.table
    arrays = {
        "table_xyz_w": np.asarray(table.xyz_w),
        "table_H_acc": np.asarray(table.H_acc),
        "table_desc": np.asarray(table.desc),
        "table_n_updates": np.asarray(table.n_updates),
        "table_last_seen": np.asarray(table.last_seen),
        "table_valid": np.asarray(table.valid),
        "table_origin_kf": np.asarray(table.origin_kf),
        "table_protected": np.asarray(table.protected),
        "T_world_cam": tracker.T_world_cam,
        "last_motion": tracker.last_motion,
        "trajectory": np.stack(tracker.trajectory) if tracker.trajectory else np.zeros((0, 4, 4)),
        "kf_poses": np.stack(engine.kf_poses) if engine.kf_poses else np.zeros((0, 4, 4)),
        "kf_odometry": np.stack(engine.kf_odometry) if engine.kf_odometry else np.zeros((0, 4, 4)),
        # The relocalizer database is NOT serialized: it is a pure function
        # of the local maps (load_checkpoint re-adds them in map_id order,
        # reproducing rows, dedup bookkeeping and membership exactly).
    }
    if hasattr(tracker, "state"):  # fused: slot free-list lives on device
        fc = int(tracker.state.free_count)
        arrays["free_slots"] = np.asarray(tracker.state.free_list[:fc])
    else:
        arrays["free_slots"] = np.asarray(tracker.allocator._free, np.int32)
    # Local maps flattened with per-map offsets.
    lm_meta = []
    slot_blocks, xyz_blocks, desc_blocks, kf_blocks = [], [], [], []
    for m in engine.world_map.local_maps:
        lm_meta.append({"map_id": m.map_id, "keyframe_index": m.keyframe_index,
                        "n": len(m.landmark_slots)})
        slot_blocks.append(m.landmark_slots)
        xyz_blocks.append(m.xyz_kf)
        if m.desc is not None:
            desc_blocks.append(m.desc)
        else:
            # Device-resident descriptors (slim-drain mode): materialize
            # the padded device block once here — checkpointing is an
            # end-of-run/rare operation.
            desc_blocks.append(
                np.asarray(m.desc_dev)[: len(m.landmark_slots)]
            )
        kf_blocks.append(m.T_world_kf)
    arrays["lm_slots"] = np.concatenate(slot_blocks) if slot_blocks else np.zeros(0, np.int32)
    arrays["lm_xyz"] = np.concatenate(xyz_blocks) if xyz_blocks else np.zeros((0, 3), np.float32)
    arrays["lm_desc"] = np.concatenate(desc_blocks) if desc_blocks else np.zeros((0, 8), np.uint32)
    arrays["lm_kf_poses"] = np.stack(kf_blocks) if kf_blocks else np.zeros((0, 4, 4), np.float32)
    closure_edges = [
        {"i": int(i), "j": int(j), "T": T.tolist()} for (i, j, T) in engine.closure_edges
    ]
    meta = {
        "version": FORMAT_VERSION,
        "frame_idx": tracker.frame_idx,
        "status": tracker.status,
        "radius_px": tracker.radius_px,
        "desc_gate": tracker.desc_gate,
        "threshold": tracker.controller.threshold,
        "allocator_next": tracker.allocator._next,
        "allocator_free": tracker.allocator._free,
        "local_maps": lm_meta,
        "closure_edges": closure_edges,
        "n_optimizations": engine.n_optimizations,
        "n_merges": engine.n_merges,
        "kf_frame_indices": [int(v) for v in engine.kf_frame_indices],
        "kf_odom_weight": [float(v) for v in engine.kf_odom_weight],
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(engine, path: str) -> None:
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} != {FORMAT_VERSION}")
    tracker = engine.tracker

    cap = tracker.table.capacity
    stored = data["table_xyz_w"].shape[0]
    assert stored == cap, f"landmark capacity mismatch: ckpt {stored}, engine {cap}"
    tracker.table = lm_mod.LandmarkTable(
        xyz_w=jnp.asarray(data["table_xyz_w"]),
        H_acc=jnp.asarray(data["table_H_acc"]),
        desc=jnp.asarray(data["table_desc"]),
        n_updates=jnp.asarray(data["table_n_updates"]),
        last_seen=jnp.asarray(data["table_last_seen"]),
        valid=jnp.asarray(data["table_valid"]),
        origin_kf=jnp.asarray(data["table_origin_kf"]),
        protected=jnp.asarray(data["table_protected"]),
    )
    tracker.T_world_cam = data["T_world_cam"].astype(np.float32)
    tracker.last_motion = data["last_motion"].astype(np.float32)
    tracker.trajectory = [T.astype(np.float32) for T in data["trajectory"]]
    tracker.frame_idx = meta["frame_idx"]
    tracker.status = meta["status"]
    tracker.radius_px = meta["radius_px"]
    tracker.desc_gate = meta["desc_gate"]
    tracker.controller.threshold = meta["threshold"]
    n_maps = len(meta["local_maps"])
    if hasattr(tracker, "state"):  # fused tracker: allocator is in-state
        last_kf = (
            data["lm_kf_poses"][-1].astype(np.float32)
            if n_maps
            else np.eye(4, dtype=np.float32)
        )
        free_slots = data["free_slots"].astype(np.int32)
        F = tracker.state.free_list.shape[0]
        fl = np.zeros(F, np.int32)
        fc = min(len(free_slots), F)
        fl[:fc] = free_slots[:fc]
        tracker.state = tracker.state._replace(
            next_slot=jnp.int32(meta["allocator_next"]),
            has_prev=jnp.asarray(False),  # next frame re-seeds tracking
            localizing=jnp.asarray(True),  # reference resumes in Localizing
            kf_count=jnp.int32(n_maps),
            T_last_kf=jnp.asarray(last_kf),
            frames_since_kf=jnp.int32(0),
            free_list=jnp.asarray(fl),
            free_count=jnp.int32(fc),
        )
        tracker.allocator._free = []
        tracker._kf_harvested = n_maps
        tracker._pending_keyframes = []
        tracker._pending_corrections = []
        tracker._break_frames = []
    else:
        tracker.allocator._next = meta["allocator_next"]
        tracker.allocator._free = list(data["free_slots"].astype(int))
        tracker.prev_frame = None  # next frame re-seeds tracking (Localizing)
        tracker.kf_count = n_maps
        tracker._break_frames = []
    tracker.stats.n_frames = meta["frame_idx"]

    engine.kf_poses = [T.astype(np.float32) for T in data["kf_poses"]]
    engine.kf_odometry = [T.astype(np.float32) for T in data["kf_odometry"]]
    engine.kf_frame_indices = list(meta["kf_frame_indices"])
    engine.kf_odom_weight = list(meta["kf_odom_weight"])
    engine._breaks_consumed = 0
    engine.closure_edges = [
        (e["i"], e["j"], np.asarray(e["T"], np.float32)) for e in meta["closure_edges"]
    ]
    engine.n_optimizations = meta["n_optimizations"]
    engine.n_merges = meta["n_merges"]

    # Rebuild local maps + relocalizer database.
    engine.world_map.local_maps = []
    off = 0
    for m, T_kf in zip(meta["local_maps"], data["lm_kf_poses"]):
        n = m["n"]
        engine.world_map.local_maps.append(
            LocalMap(
                map_id=m["map_id"],
                keyframe_index=m["keyframe_index"],
                T_world_kf=T_kf.astype(np.float32),
                landmark_slots=data["lm_slots"][off : off + n],
                xyz_kf=data["lm_xyz"][off : off + n],
                desc=data["lm_desc"][off : off + n],
            )
        )
        off += n
    if engine.world_map.local_maps:
        engine.world_map._last_T = engine.world_map.local_maps[-1].T_world_kf.copy()

    reloc = engine.relocalizer
    reloc.db_desc = jnp.zeros_like(reloc.db_desc)
    reloc.db_map_id = jnp.full_like(reloc.db_map_id, -1)
    reloc.row_slot[:] = -1
    reloc.n_rows = 0
    reloc.maps = {}
    reloc._slot_in_db = set()
    reloc._slot_maps = {}
    reloc._map_slot_row = {}
    for m in engine.world_map.local_maps:
        reloc.add_local_map(m)
