"""Sharded loop-closure descriptor search.

Replaces the reference's HBST tree (relocalizer.cpp:55-70) at scale: the
keyframe descriptor database lives row-sharded across the "lm" mesh axis;
a query block is replicated, each shard computes its slice of the
XOR-popcount (or int8-matmul) distance matrix and its local top-1 per
query, and one psum-style min-reduction combines the per-shard winners.
Communication: O(Q) scalars — independent of database size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vslam_tpu.ops import hamming


def search_sharded(
    query: jnp.ndarray,  # (Q, 8) uint32
    db: jnp.ndarray,  # (D, 8) uint32, D divisible by mesh size
    db_valid: jnp.ndarray,  # (D,) bool
    mesh: Mesh,
    axis_name: str = "lm",
    use_mxu: bool = True,
):
    """Global nearest descriptor per query.  Returns (best_idx (Q,) int32
    into the full db, best_dist (Q,) int32)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
    )
    def run(q, db_shard, valid_shard):
        if use_mxu:
            dist = hamming.hamming_matrix_mxu(q, db_shard)
        else:
            dist = hamming.hamming_matrix(q, db_shard)
        dist = jnp.where(valid_shard[None, :], dist, hamming.BIG)
        local_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
        local_best = jnp.take_along_axis(dist, local_idx[:, None], axis=1)[:, 0]
        shard_size = db_shard.shape[0]
        my_shard = jax.lax.axis_index(axis_name)
        global_idx = local_idx + my_shard * shard_size
        # Min-reduce (dist, idx) lexicographically across shards: distances
        # are <= 256 (9 bits), so pack dist<<23 | idx into int32 (db size up
        # to 2^23 rows) and take one integer pmin.  Masked rows carry the
        # sentinel 511.
        d9 = jnp.minimum(local_best, 511)
        packed = (d9 << 23) | global_idx
        packed = jax.lax.pmin(packed, axis_name)
        best_dist = (packed >> 23).astype(jnp.int32)
        best_idx = (packed & ((1 << 23) - 1)).astype(jnp.int32)
        return best_idx, best_dist

    return run(query, db, db_valid)
