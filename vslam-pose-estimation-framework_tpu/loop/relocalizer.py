"""Loop-closure detection and geometric verification.

Replaces the reference Relocalizer's HBST tree
(src/relocalization/relocalizer.cpp:42-280) with the Hamming-matmul
database design (SURVEY.md §2.5): every past local map's packed descriptor
block is appended to one device-resident database matrix; a query local
map is matched against the whole database in a single masked
XOR-popcount/int8-matmul program; votes are counted per reference map, and
surviving candidates are verified with the point-to-point ICP aligner
(reference XYZAligner, xyz_aligner.cpp:106-177).

The database can be row-sharded over the device mesh via
parallel/sharded_search.py — the query program is identical.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.io.config import RelocalizationParameters
from vslam_tpu.mapping.local_maps import Closure, LocalMap
from vslam_tpu.ops import hamming
from vslam_tpu.solve import aligners, gn


@jax.jit
def _query_database(q_desc, db_desc, db_valid, max_distance, min_margin):
    """Best match per query row under a distance gate AND a Lowe-style
    absolute margin against the second-best (the parallel equivalent of the
    reference's ratio test on knnMatch results,
    stereo_framepoint_generator.cpp:196-206): ambiguous descriptors — the
    dominant failure mode of place recognition — match many rows almost
    equally well and are rejected by the margin."""
    dist = hamming.hamming_matrix_mxu(q_desc, db_desc)
    dist = jnp.where(db_valid[None, :], dist, hamming.BIG)
    top2_neg, top2_idx = jax.lax.top_k(-dist, 2)
    best = top2_idx[:, 0].astype(jnp.int32)
    best_d = -top2_neg[:, 0]
    second_d = -top2_neg[:, 1]
    ok = (best_d <= max_distance) & (second_d - best_d >= min_margin)
    return best, ok, best_d


@jax.jit
def _insert_chunk(db_desc, db_valid, chunk_desc, chunk_len, offset):
    """Fixed-shape database append: one compiled program for every insert
    (variable-length slices would recompile per local-map size)."""
    chunk = chunk_desc.shape[0]
    db_desc = jax.lax.dynamic_update_slice(db_desc, chunk_desc, (offset, 0))
    valid_chunk = (
        jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0).squeeze(-1) < chunk_len
    )
    db_valid = jax.lax.dynamic_update_slice(db_valid, valid_chunk, (offset,))
    return db_desc, db_valid


class Relocalizer:
    QUERY_CAP = 1024  # fixed query/insert chunk (>= local_map max landmarks)

    def __init__(self, params: RelocalizationParameters, capacity: int = 131072,
                 mesh=None):
        self.params = params
        self.capacity = capacity
        # With a device mesh, queries run row-sharded across all devices
        # (parallel/sharded_search.py) — same results, database-size scaling
        # (the HBST-at-scale replacement, relocalizer.cpp:55-70).
        self.mesh = mesh
        # Device-resident database (fixed capacity, appended in place).
        self.db_desc = jnp.zeros((capacity, 8), jnp.uint32)
        self.db_valid = jnp.zeros(capacity, bool)
        # Host-side row metadata.
        self.row_map_id = np.full(capacity, -1, np.int32)
        self.row_slot = np.full(capacity, -1, np.int32)
        self.row_xyz_kf = np.zeros((capacity, 3), np.float32)
        self.n_rows = 0
        self.maps: dict[int, LocalMap] = {}
        # One database row per landmark: consecutive local maps share most
        # of their landmarks, and duplicate rows of the SAME landmark would
        # defeat the second-best-margin ambiguity test (two identical
        # descriptors in adjacent maps look like an ambiguous match).  The
        # reference's HBST merges matchables of one landmark the same way
        # (SRRG_MERGE_DESCRIPTORS, relocalizer.cpp:153-171).
        self._slot_in_db: set[int] = set()

    # ------------------------------------------------------------------
    def _grow(self):
        """Double the device database (power-of-two growth: the query and
        insert programs recompile only O(log maps) times over a run —
        replaces the round-1 silent 128-local-map cap)."""
        from vslam_tpu.utils import log

        new_cap = self.capacity * 2
        log.warning(
            f"relocalizer database full at {self.n_rows} rows — growing "
            f"to {new_cap}"
        )
        db_desc = jnp.zeros((new_cap, 8), jnp.uint32)
        db_valid = jnp.zeros(new_cap, bool)
        self.db_desc = jax.lax.dynamic_update_slice(db_desc, self.db_desc, (0, 0))
        self.db_valid = jax.lax.dynamic_update_slice(db_valid, self.db_valid, (0,))
        for name in ("row_map_id", "row_slot"):
            old = getattr(self, name)
            new = np.full(new_cap, -1, old.dtype)
            new[: self.capacity] = old
            setattr(self, name, new)
        xyz = np.zeros((new_cap, 3), np.float32)
        xyz[: self.capacity] = self.row_xyz_kf
        self.row_xyz_kf = xyz
        self.capacity = new_cap

    def add_local_map(self, lm: LocalMap) -> None:
        kk = min(len(lm.landmark_slots), self.QUERY_CAP)
        # Dedup by landmark slot: only landmarks not yet in the database
        # contribute rows (see _slot_in_db above).
        fresh = [
            i for i in range(kk)
            if int(lm.landmark_slots[i]) not in self._slot_in_db
        ]
        k = len(fresh)
        self.maps[lm.map_id] = lm
        if k == 0:
            return
        while self.n_rows + self.QUERY_CAP > self.capacity:
            self._grow()
        chunk = np.zeros((self.QUERY_CAP, 8), np.uint32)
        chunk[:k] = lm.desc[fresh]
        self.db_desc, self.db_valid = _insert_chunk(
            self.db_desc,
            self.db_valid,
            jnp.asarray(chunk),
            jnp.int32(k),
            jnp.int32(self.n_rows),
        )
        sl = slice(self.n_rows, self.n_rows + k)
        self.row_map_id[sl] = lm.map_id
        self.row_slot[sl] = lm.landmark_slots[fresh]
        self.row_xyz_kf[sl] = lm.xyz_kf[fresh]
        self.n_rows += k
        self._slot_in_db.update(int(lm.landmark_slots[i]) for i in fresh)

    # ------------------------------------------------------------------
    def apply_remap(self, remap: dict[int, int]) -> None:
        """Follow landmark merges: database rows referencing an absorbed
        slot now reference its representative (reference LocalMap::replace
        keeps local maps consistent after merging, local_map.cpp:109-127)."""
        if not remap or self.n_rows == 0:
            return
        rows = self.row_slot[: self.n_rows]
        for src, dst in remap.items():
            rows[rows == src] = dst
            if src in self._slot_in_db:
                self._slot_in_db.discard(src)
                self._slot_in_db.add(dst)

    # ------------------------------------------------------------------
    def detect_and_verify(self, query: LocalMap) -> Closure | None:
        """Query the database with a new local map; verify the best
        candidate geometrically.  Returns a Closure or None."""
        p = self.params
        if self.n_rows == 0 or len(query.landmark_slots) == 0:
            return None

        # Interspace gating happens BEFORE the argmin: rows of recent maps
        # are excluded from the search entirely (relocalizer.cpp:74-86) —
        # otherwise self-matches at distance 0 always win the argmin and the
        # true revisit is shadowed.
        eligible = (
            self.row_map_id <= query.map_id - p.preliminary_minimum_interspace_queries
        ) & (self.row_map_id >= 0)
        # Fixed-shape query: pad to QUERY_CAP so every query compiles once.
        nq = min(len(query.landmark_slots), self.QUERY_CAP)
        q_desc = np.zeros((self.QUERY_CAP, 8), np.uint32)
        q_desc[:nq] = query.desc[:nq]
        valid_rows = self.db_valid & jnp.asarray(eligible)
        if (
            self.mesh is not None
            and self.capacity % self.mesh.size == 0
            and self.capacity <= (1 << 22)  # packed-index limit
        ):
            from vslam_tpu.parallel import sharded_search

            idx, best_d, second_d = sharded_search.search_sharded_top2(
                jnp.asarray(q_desc), self.db_desc, valid_rows, self.mesh
            )
            ok = (best_d <= p.maximum_descriptor_distance) & (
                second_d - best_d >= p.minimum_second_best_margin
            )
        else:
            idx, ok, _ = _query_database(
                jnp.asarray(q_desc),
                self.db_desc,
                valid_rows,
                jnp.int32(p.maximum_descriptor_distance),
                jnp.int32(p.minimum_second_best_margin),
            )
        idx = np.asarray(idx)[:nq]
        ok = np.asarray(ok)[:nq]
        if not ok.any():
            return None
        map_ids = self.row_map_id[idx]
        ok = ok & (map_ids >= 0)
        if not ok.any():
            return None
        votes = np.bincount(map_ids[ok], minlength=len(self.maps) + 1)
        best_map = int(votes.argmax())
        n_votes = int(votes[best_map])
        ratio = n_votes / len(query.landmark_slots)
        if (
            ratio < p.preliminary_minimum_matching_ratio
            or n_votes < p.icp_minimum_number_of_inliers
        ):
            from vslam_tpu.utils import log

            log.debug(
                f"closure candidate {best_map}<-{query.map_id}: vote gate "
                f"failed ({n_votes} votes, ratio {ratio:.3f})"
            )
            return None

        # Correspondences into the winning map.
        sel = ok & (map_ids == best_map)
        q_rows = np.flatnonzero(sel)
        ref_rows = idx[sel]
        p_moving = query.xyz_kf[q_rows]  # query keyframe frame
        p_fixed = self.row_xyz_kf[ref_rows]  # reference keyframe frame

        # Geometric verification: robust point-to-point ICP.
        n = len(q_rows)
        cap = 256
        pad = max(cap - n, 0)
        data = aligners.ICPData(
            p_moving=jnp.asarray(
                np.pad(p_moving[:cap], ((0, pad), (0, 0))).astype(np.float32)
            ),
            p_fixed=jnp.asarray(
                np.pad(p_fixed[:cap], ((0, pad), (0, 0))).astype(np.float32)
            ),
            weight=jnp.ones(cap, jnp.float32),
        )
        mask = jnp.asarray(np.arange(cap) < min(n, cap))
        icp_config = gn.GNConfig(
            kernel_max_error=p.icp_maximum_error_kernel,
            min_num_inliers=p.icp_minimum_number_of_inliers,
            max_iterations=50,
        )
        if p.aligner_type == "FAST-ICP":
            # Fork's AA-ICP (fast_aligner.cpp): Anderson-accelerated
            # IRLS-Procrustes — selected exactly like the reference
            # (relocalizer.cpp:19-27).
            from vslam_tpu.solve import anderson

            res = anderson.fast_icp_align(data, mask, jnp.eye(4), icp_config)
        else:
            res = aligners.icp_align(data, mask, jnp.eye(4), icp_config)
        n_inl = int(res.num_inliers)
        inlier_ratio = n_inl / max(min(n, cap), 1)
        if (
            not bool(res.converged)
            or n_inl < p.icp_minimum_number_of_inliers
            or inlier_ratio < p.icp_minimum_inlier_ratio
        ):
            from vslam_tpu.utils import log

            log.debug(
                f"closure candidate {best_map}<-{query.map_id}: ICP rejected "
                f"(converged={bool(res.converged)}, inliers={n_inl}/"
                f"{min(n, cap)}, chi2={float(res.chi2):.3f})"
            )
            return None

        corr = np.stack(
            [np.asarray(query.landmark_slots)[q_rows], self.row_slot[ref_rows]],
            axis=1,
        )
        return Closure(
            query_id=query.map_id,
            reference_id=best_map,
            T_ref_query=np.asarray(res.x),
            n_correspondences=n,
            inlier_ratio=inlier_ratio,
            correspondences=corr.astype(np.int32),
        )
