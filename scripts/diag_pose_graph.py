"""Prototype: junction-graph reduction for the pose-graph back-end.

Contract chain segments between closure endpoints into composed
super-edges, solve the small dense pose graph over junctions, distribute
corrections geodesically along segments.  Validates accuracy + speed on
the drifted multi-lap circle that defeats the chain/Woodbury solver.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vslam_tpu.backend import pose_graph as pg
from vslam_tpu.ops import lie


def build_problem(P=341, laps=2.5, drift_rot=8e-4, drift_t=2e-3, n_clo=181,
                  radius=65.0, seed=0):
    angles = np.linspace(0, 2 * np.pi * laps, P)
    gt = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    for k, a in enumerate(angles):
        c, s = np.cos(a), np.sin(a)
        gt[k, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        gt[k, :3, 3] = [radius * np.cos(a), 0.0, radius * np.sin(a)]
    rng = np.random.default_rng(seed)
    odo = np.zeros((P - 1, 4, 4), np.float32)
    est = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
    est[0] = gt[0]
    for k in range(P - 1):
        T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        xi = np.zeros(6, np.float32)
        xi[:3] = drift_t * (1 + 0.1 * rng.standard_normal(3))
        xi[4] = drift_rot * (1 + 0.1 * rng.standard_normal())
        odo[k] = T_rel @ np.asarray(lie.exp_se3(jnp.asarray(xi)))
        est[k + 1] = est[k] @ odo[k]
    per_lap = int(P / laps)
    clo = []
    for j in range(per_lap + 5, P, max(1, (P - per_lap) // n_clo)):
        clo.append((j - per_lap, j, np.linalg.inv(gt[j - per_lap]) @ gt[j]))
    return gt, est, odo, clo[:n_clo]


def compact_closures(closures, bucket=4):
    """Keep the most recent closure per (ref//bucket, query//bucket) cell."""
    best = {}
    for (i, j, T) in closures:
        best[(i // bucket, j // bucket)] = (i, j, T)
    return sorted(best.values(), key=lambda e: (e[1], e[0]))


def junction_solve(est, odo, closures, iterations=10, max_step=1e9):
    """Reduce to junction graph, dense-solve, distribute. Returns opt poses."""
    P = len(est)
    # Junctions: anchor 0, every closure endpoint, and the newest pose.
    junc = sorted({0, P - 1} | {i for i, _, _ in closures} | {j for _, j, _ in closures})
    jidx = {k: n for n, k in enumerate(junc)}
    J = len(junc)
    # Super-edges between consecutive junctions: composed odometry.
    se_i, se_j, se_T, se_w = [], [], [], []
    for a, b in zip(junc[:-1], junc[1:]):
        T = np.eye(4, dtype=np.float32)
        for k in range(a, b):
            T = T @ odo[k]
        se_i.append(jidx[a]); se_j.append(jidx[b]); se_T.append(T)
        se_w.append(1.0 / (b - a))  # chain compliance grows with length
    for (i, j, T) in closures:
        se_i.append(jidx[i]); se_j.append(jidx[j]); se_T.append(T)
        se_w.append(10.0)

    def pow2(x):
        return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 3)

    Jp = pow2(J)
    E = len(se_i)
    Ep = pow2(E)
    poses_arr = np.tile(np.eye(4, dtype=np.float32), (Jp, 1, 1))
    poses_arr[:J] = est[junc]
    ei = np.zeros(Ep, np.int32); ej = np.zeros(Ep, np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (Ep, 1, 1))
    ew = np.zeros(Ep, np.float32)
    ei[:E] = se_i; ej[:E] = se_j; eT[:E] = se_T; ew[:E] = se_w
    graph = pg.PoseGraph(
        poses=jnp.asarray(poses_arr),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        edge_T_ij=jnp.asarray(eT), edge_weight=jnp.asarray(ew),
        edge_valid=jnp.asarray(np.arange(Ep) < E),
        pose_valid=jnp.asarray(np.arange(Jp) < J),
    )
    t0 = time.perf_counter()
    opt, chi2 = pg.optimize_pose_graph(graph, iterations=iterations)
    opt = np.asarray(opt)[:J]
    dt = time.perf_counter() - t0
    # Distribute: segment (a, b); interior k gets geodesic blend of endpoint
    # corrections C_a, C_b with s = chain position.
    out = est.copy()
    corr = np.stack([opt[n] @ np.linalg.inv(est[junc[n]]) for n in range(J)])
    for n, (a, b) in enumerate(zip(junc[:-1], junc[1:])):
        Ca, Cb = corr[n], corr[n + 1]
        delta = np.asarray(lie.log_se3(jnp.asarray(Cb @ np.linalg.inv(Ca))))
        for k in range(a, b + 1):
            s = (k - a) / max(b - a, 1)
            Ck = np.asarray(lie.exp_se3(jnp.asarray(s * delta))) @ Ca
            out[k] = Ck @ est[k]
    # Poses outside [junc0, juncJ]: before first junction -> C_0; after last -> C_last.
    for k in range(0, junc[0]):
        out[k] = corr[0] @ est[k]
    for k in range(junc[-1] + 1, P):
        out[k] = corr[-1] @ est[k]
    return out, float(chi2), dt, J, E


def main():
    gt, est, odo, clo = build_problem()
    drift = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    print(f"pre-opt: rmse {np.sqrt((drift**2).mean()):.3f} max {drift.max():.3f} ({len(clo)} closures)")

    for bucket in (1, 4, 8):
        cc = compact_closures(clo, bucket)
        t_all = time.perf_counter()
        opt, chi2, dt, J, E = junction_solve(est, odo, cc, iterations=10)
        t_all = time.perf_counter() - t_all
        err = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1)
        print(f"bucket={bucket}: closures {len(cc)}, J={J}, E={E}: rmse {np.sqrt((err**2).mean()):.3f} "
              f"max {err.max():.3f} chi2 {chi2:.4f} solve {dt:.2f}s total {t_all:.2f}s")
    # Repeat timing (compiled)
    cc = compact_closures(clo, 4)
    t0 = time.perf_counter()
    opt, chi2, dt, J, E = junction_solve(est, odo, cc, iterations=10)
    print(f"warm repeat: solve {dt*1e3:.0f} ms, full (incl. host distribute) {(time.perf_counter()-t0)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
