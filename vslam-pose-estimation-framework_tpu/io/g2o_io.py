"""g2o text-format pose-graph export/import.

Byte-format parity with the reference's writePoseGraphToFile
(src/map_optimization/graph_optimizer.cpp:164-262): VERTEX_SE3:QUAT and
EDGE_SE3:QUAT records, so the exported graph is consumable by stock g2o
tooling and by trajectory_converter (trajectory_converter.cpp:38-89).
"""

from __future__ import annotations

import numpy as np


def write_pose_graph(
    path: str,
    poses: np.ndarray,  # (P, 4, 4)
    edges: list,  # [(i, j, T_ij (4,4), info_scale)]
    fixed: int = 0,
) -> None:
    import jax.numpy as jnp

    from vslam_tpu.ops import lie

    def quat_of(T):
        q = np.asarray(lie.rot_to_quat(jnp.asarray(T[:3, :3].astype(np.float32))))
        return q  # (w, x, y, z)

    with open(path, "w") as f:
        for i, T in enumerate(poses):
            qw, qx, qy, qz = quat_of(T)
            t = T[:3, 3]
            f.write(
                f"VERTEX_SE3:QUAT {i} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}\n"
            )
        if len(poses):
            f.write(f"FIX {fixed}\n")
        for (i, j, T_ij, w) in edges:
            qw, qx, qy, qz = quat_of(T_ij)
            t = T_ij[:3, 3]
            info = np.eye(6) * w
            upper = [info[r, c] for r in range(6) for c in range(r, 6)]
            f.write(
                f"EDGE_SE3:QUAT {i} {j} {t[0]:.9f} {t[1]:.9f} {t[2]:.9f} "
                f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f} "
                + " ".join(f"{v:.6f}" for v in upper)
                + "\n"
            )


def read_pose_graph(path: str):
    """Returns (poses (P,4,4), edges [(i, j, T_ij, info_scale)])."""
    import jax.numpy as jnp

    from vslam_tpu.ops import lie

    poses = {}
    edges = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                idx = int(parts[1])
                tx, ty, tz, qx, qy, qz, qw = map(float, parts[2:9])
                T = np.eye(4)
                T[:3, :3] = np.asarray(
                    lie.quat_to_rot(jnp.asarray(np.array([qw, qx, qy, qz], np.float32)))
                )
                T[:3, 3] = [tx, ty, tz]
                poses[idx] = T
            elif parts[0] == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                tx, ty, tz, qx, qy, qz, qw = map(float, parts[3:10])
                T = np.eye(4)
                T[:3, :3] = np.asarray(
                    lie.quat_to_rot(jnp.asarray(np.array([qw, qx, qy, qz], np.float32)))
                )
                T[:3, 3] = [tx, ty, tz]
                info_scale = float(parts[10]) if len(parts) > 10 else 1.0
                edges.append((i, j, T, info_scale))
    n = max(poses) + 1 if poses else 0
    out = np.tile(np.eye(4), (n, 1, 1))
    for idx, T in poses.items():
        out[idx] = T
    return out, edges
