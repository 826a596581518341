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

    def __init__(self, params: RelocalizationParameters, capacity: int = 131072):
        self.params = params
        self.capacity = capacity
        # Device-resident database (fixed capacity, appended in place).
        self.db_desc = jnp.zeros((capacity, 8), jnp.uint32)
        self.db_valid = jnp.zeros(capacity, bool)
        # Host-side row metadata.
        self.row_map_id = np.full(capacity, -1, np.int32)
        self.row_slot = np.full(capacity, -1, np.int32)
        self.row_xyz_kf = np.zeros((capacity, 3), np.float32)
        self.n_rows = 0
        self.maps: dict[int, LocalMap] = {}

    # ------------------------------------------------------------------
    def add_local_map(self, lm: LocalMap) -> None:
        k = min(len(lm.landmark_slots), self.QUERY_CAP)
        if k == 0 or self.n_rows + self.QUERY_CAP > self.capacity:
            return
        chunk = np.zeros((self.QUERY_CAP, 8), np.uint32)
        chunk[:k] = lm.desc[:k]
        self.db_desc, self.db_valid = _insert_chunk(
            self.db_desc,
            self.db_valid,
            jnp.asarray(chunk),
            jnp.int32(k),
            jnp.int32(self.n_rows),
        )
        sl = slice(self.n_rows, self.n_rows + k)
        self.row_map_id[sl] = lm.map_id
        self.row_slot[sl] = lm.landmark_slots[:k]
        self.row_xyz_kf[sl] = lm.xyz_kf[:k]
        self.n_rows += k
        self.maps[lm.map_id] = lm

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
        idx, ok, dist = _query_database(
            jnp.asarray(q_desc),
            self.db_desc,
            self.db_valid & jnp.asarray(eligible),
            jnp.int32(p.maximum_descriptor_distance),
            jnp.int32(p.minimum_second_best_margin),
        )
        idx = np.asarray(idx)[:nq]
        ok = np.asarray(ok)[:nq]
        if not ok.any():
            return None
        map_ids = self.row_map_id[idx]
        votes = np.bincount(map_ids[ok], minlength=len(self.maps) + 1)
        best_map = int(votes.argmax())
        n_votes = int(votes[best_map])
        ratio = n_votes / len(query.landmark_slots)
        if (
            ratio < p.preliminary_minimum_matching_ratio
            or n_votes < p.icp_minimum_number_of_inliers
        ):
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
        res = aligners.icp_align(
            data,
            mask,
            jnp.eye(4),
            gn.GNConfig(
                kernel_max_error=p.icp_maximum_error_kernel,
                min_num_inliers=p.icp_minimum_number_of_inliers,
                max_iterations=50,
            ),
        )
        n_inl = int(res.num_inliers)
        inlier_ratio = n_inl / max(min(n, cap), 1)
        if (
            not bool(res.converged)
            or n_inl < p.icp_minimum_number_of_inliers
            or inlier_ratio < p.icp_minimum_inlier_ratio
        ):
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
