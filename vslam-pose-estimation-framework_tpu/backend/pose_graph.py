"""Pose-graph optimization on SE(3) — the loop-closure back-end.

Replaces the reference's g2o pose-graph mode (GraphOptimizer::addPose +
optimizePoseGraph, src/map_optimization/graph_optimizer.cpp:264-317,
411-457): vertices are keyframe poses, binary edges are odometry and
(x10-weighted) loop-closure constraints.  Instead of sparse CHOLMOD, the
whole problem is solved as a dense damped GN on the SE(3)^P product
manifold — keyframe counts (hundreds to a few thousand) make the 6P
reduced system small by TPU standards, and the assembly is one
edge-batched einsum + scatter-add program.

Residual per edge (i, j, T_ij): log_se3( T_ij^-1 · T_i^-1 · T_j )  (6,)
Gauge freedom fixed by an identity-anchoring prior on vertex 0.
Cauchy-style robust reweighting mirrors the reference's robust kernels on
closure edges (graph_optimizer.cpp:490-526).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.ops import lie


class PoseGraph(NamedTuple):
    """Edge-list pose graph (fixed capacity, masked)."""

    poses: jnp.ndarray  # (P, 4, 4) T_world_keyframe
    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,) int32
    edge_T_ij: jnp.ndarray  # (E, 4, 4) measured T_i^-1 T_j
    edge_weight: jnp.ndarray  # (E,) f32 information scale (closures x10)
    edge_valid: jnp.ndarray  # (E,) bool
    pose_valid: jnp.ndarray  # (P,) bool


def _edge_residual(poses, i, j, T_ij):
    Ti_inv = lie.inverse(poses[i])
    return lie.log_se3(lie.inverse(T_ij) @ Ti_inv @ poses[j])


def _edge_residual_jac(poses, i, j, T_ij):
    """Residual + Jacobians wrt left-mult tangents of pose i and pose j."""

    def r_of(dxi, dxj):
        Ti = lie.exp_se3(dxi) @ poses[i]
        Tj = lie.exp_se3(dxj) @ poses[j]
        return lie.log_se3(lie.inverse(T_ij) @ lie.inverse(Ti) @ Tj)

    z = jnp.zeros(6, poses.dtype)
    r = r_of(z, z)
    Ji = jax.jacfwd(r_of, argnums=0)(z, z)
    Jj = jax.jacfwd(r_of, argnums=1)(z, z)
    return r, Ji, Jj


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(
    graph: PoseGraph,
    iterations: int = 10,
    damping: float = 1e-3,
    robust_kernel_chi2: float = 1.0,
    anchor_weight: float = 1e6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run damped GN; returns (optimized poses (P,4,4), final chi2)."""
    P = graph.poses.shape[0]

    def one_iter(poses, _):
        r, Ji, Jj = jax.vmap(
            lambda i, j, T: _edge_residual_jac(poses, i, j, T)
        )(graph.edge_i, graph.edge_j, graph.edge_T_ij)

        chi2 = jnp.sum(r * r, axis=1)
        w = jnp.where(chi2 > robust_kernel_chi2,
                      robust_kernel_chi2 / jnp.maximum(chi2, 1e-12), 1.0)
        w = w * graph.edge_weight * graph.edge_valid

        # Dense assembly: H is (P, 6, P, 6) scatter-added per edge block.
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
        Hij = jnp.einsum("eri,e,erj->eij", Ji, w, Jj)
        bi = jnp.einsum("eri,e,er->ei", Ji, w, r)
        bj = jnp.einsum("eri,e,er->ei", Jj, w, r)

        H = jnp.zeros((P, 6, P, 6), poses.dtype)
        ii, jj = graph.edge_i, graph.edge_j
        H = H.at[ii, :, ii, :].add(Hii)
        H = H.at[jj, :, jj, :].add(Hjj)
        H = H.at[ii, :, jj, :].add(Hij)
        H = H.at[jj, :, ii, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((P, 6), poses.dtype)
        b = b.at[ii].add(bi)
        b = b.at[jj].add(bj)

        # Gauge anchor on vertex 0 + damping; invalid poses are frozen by a
        # huge diagonal.
        eye6 = jnp.eye(6, dtype=poses.dtype)
        diag_w = damping + anchor_weight * (jnp.arange(P) == 0)
        diag_w = diag_w + jnp.where(graph.pose_valid, 0.0, 1e12)
        pr = jnp.arange(P)
        H = H.at[pr, :, pr, :].add(diag_w[:, None, None] * eye6)

        Hd = H.reshape(P * 6, P * 6)
        bd = b.reshape(P * 6)
        L = jax.scipy.linalg.cho_factor(Hd, lower=True)
        dx = -jax.scipy.linalg.cho_solve(L, bd).reshape(P, 6)
        # Trust region: clamp per-pose step.
        norm = jnp.linalg.norm(dx, axis=1, keepdims=True)
        dx = dx * jnp.minimum(1.0, 1.0 / jnp.maximum(norm, 1e-12))
        new_poses = jax.vmap(lambda T, d: lie.orthonormalize_transform(lie.exp_se3(d) @ T))(
            poses, dx
        )
        ok = jnp.all(jnp.isfinite(dx))
        new_poses = jnp.where(ok, new_poses, poses)
        total_chi2 = jnp.sum(chi2 * w)
        return new_poses, total_chi2

    poses, chi2s = jax.lax.scan(one_iter, graph.poses, None, length=iterations)
    return poses, chi2s[-1]
