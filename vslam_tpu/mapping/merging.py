"""Landmark merging after loop closures: union-find id relabeling.

The reference merges landmarks by splicing framepoint pointer chains and
appearance maps (WorldMap::mergeLandmarks + Landmark::merge,
src/types/world_map.cpp:305-478, landmark.cpp:169-265).  Over columnar
tables the same operation is a host-side union-find over slot ids followed
by one batched device pass: representatives absorb the merged landmarks'
accumulated information (H_acc sums, position = information-weighted
combination, n_updates sums) and absorbed slots are invalidated and
returned to the free list.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.mapping import landmarks as lm_mod


class UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent.setdefault(p, p)
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # Keep the smaller slot id as representative (older landmark —
            # the reference also keeps the elder, world_map.cpp:420-436).
            if ra > rb:
                ra, rb = rb, ra
            self.parent[rb] = ra


@jax.jit
def _apply_merges(table: lm_mod.LandmarkTable, src: jnp.ndarray, dst: jnp.ndarray,
                  use: jnp.ndarray) -> lm_mod.LandmarkTable:
    """Batched absorb: for each (src -> dst) pair, dst += src's information
    and src is invalidated.  src/dst are (S,) slot arrays (padded; use mask).
    """
    s = jnp.where(use, src, 0)
    d = jnp.where(use, dst, 0)
    # Validity gate: a correspondence whose slot was recycled by the
    # eviction sweep since the snapshot is stale — merging it would corrupt
    # an unrelated landmark.  Gating here makes protected-slot eviction
    # safe on long runs.
    use = use & table.valid[s] & table.valid[d]
    w_src = table.n_updates[s].astype(jnp.float32)
    w_dst = table.n_updates[d].astype(jnp.float32)
    tot = jnp.maximum(w_src + w_dst, 1.0)
    xyz_merged = (
        table.xyz_w[d] * (w_dst / tot)[:, None] + table.xyz_w[s] * (w_src / tot)[:, None]
    )
    # Scatter as predicated .add deltas, never .set: padded rows all target
    # slot 0, and duplicate-index .set is nondeterministic when a genuine
    # merge also writes slot 0 — .add of a zero delta is collision-safe.
    xyz = table.xyz_w.at[d].add(
        jnp.where(use[:, None], xyz_merged - table.xyz_w[d], 0.0)
    )
    H = table.H_acc.at[d].add(jnp.where(use[:, None, None], table.H_acc[s], 0.0))
    n = table.n_updates.at[d].add(jnp.where(use, table.n_updates[s], 0))
    last = table.last_seen.at[d].max(jnp.where(use, table.last_seen[s], -1))
    valid = table.valid.at[s].set(jnp.where(use, False, table.valid[s]))
    # The representative inherits external references (local maps / closure
    # DB rows are remapped src -> dst on host), so it inherits protection;
    # the absorbed slot is freed and loses its own.
    prot = table.protected.at[d].max(jnp.where(use, table.protected[s], False))
    prot = prot.at[s].min(~use)
    return table._replace(
        xyz_w=xyz, H_acc=H, n_updates=n, last_seen=last, valid=valid, protected=prot
    )


def merge_landmarks(
    table: lm_mod.LandmarkTable,
    allocator: lm_mod.SlotAllocator,
    correspondences: np.ndarray,  # (C, 2) [slot_a, slot_b] to merge
):
    """Merge corresponding landmark pairs; returns (table, remap dict).

    remap maps absorbed slot -> representative slot, for callers holding
    slot references (local maps, frame states).
    """
    from vslam_tpu.utils import native

    # Native C++ union-find when the runtime library is built (this is the
    # hot host-side part of post-closure merging on large maps); the Python
    # UnionFind above is the behavioural reference and fallback.
    remap = native.union_find(np.asarray(correspondences, np.int32))
    if not remap:
        return table, {}

    src = np.fromiter(remap.keys(), np.int32)
    dst = np.fromiter((remap[k] for k in remap), np.int32)
    # Pad to a small set of fixed sizes to avoid recompiles.
    cap = 1 << max(int(np.ceil(np.log2(max(len(src), 1)))), 4)
    pad = cap - len(src)
    use = np.concatenate([np.ones(len(src), bool), np.zeros(pad, bool)])
    src = np.concatenate([src, np.zeros(pad, np.int32)])
    dst = np.concatenate([dst, np.zeros(pad, np.int32)])

    table = _apply_merges(
        table, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(use)
    )
    allocator.release(list(remap.keys()))
    return table, remap
