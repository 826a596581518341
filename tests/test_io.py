"""Dataset loader + g2o IO + CLI tests over generated fixture directories
(synthetic renders written as PNGs in the real dataset layouts)."""

import os
import subprocess
import sys

import numpy as np
import cv2
import pytest

from vslam_tpu.io import datasets, g2o_io, synthetic
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.eval import trajectory as traj_eval

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_seq")
    (root / "image_0").mkdir()
    (root / "image_1").mkdir()
    world = synthetic.make_world(CAM, n_frames=6, n_points=1200, seed=40, step=0.4)
    for t in range(6):
        il, ir, _ = synthetic.render_frame(world, t)
        cv2.imwrite(str(root / "image_0" / f"{t:06d}.png"), il.astype(np.uint8))
        cv2.imwrite(str(root / "image_1" / f"{t:06d}.png"), ir.astype(np.uint8))
    np.savetxt(root / "times.txt", np.arange(6) * 0.1)
    with open(root / "calib.txt", "w") as f:
        f.write("P0: 500 0 320 0 0 500 160 0 0 0 1 0\n")
        f.write(f"P1: 500 0 320 {-500*0.4} 0 500 160 0 0 0 1 0\n")
    # ground truth for eval subcommand
    traj_eval.write_kitti(str(root / "gt.txt"), world.poses.astype(np.float64))
    return root, world


def test_kitti_loader(kitti_dir):
    root, world = kitti_dir
    ds = datasets.KittiDataset(str(root))
    assert len(ds) == 6
    assert abs(float(ds.cam.fx) - 500.0) < 1e-3
    assert abs(float(ds.cam.baseline_m) - 0.4) < 1e-6
    frames = list(ds)
    assert frames[0].img_left.shape == (320, 640)
    assert frames[-1].index == 5
    # pixel content survives the png round trip
    il, _, _ = synthetic.render_frame(world, 0)
    assert np.abs(frames[0].img_left - np.clip(il, 0, 255).astype(np.uint8)).max() <= 1.0


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    cam = cam_ops.make_camera(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                              baseline_m=0.075, rows=480, cols=640)
    world = synthetic.make_world(cam, n_frames=4, n_points=1500, seed=41, step=0.2)
    with open(root / "rgb.txt", "w") as fr, open(root / "depth.txt", "w") as fd:
        fr.write("# ts filename\n")
        fd.write("# ts filename\n")
        for t in range(4):
            img, depth = synthetic.render_depth_frame(world, t)
            cv2.imwrite(str(root / "rgb" / f"{t}.png"), img.astype(np.uint8))
            d16 = (depth * 5000.0).astype(np.uint16)
            cv2.imwrite(str(root / "depth" / f"{t}.png"), d16)
            fr.write(f"{t*0.1:.6f} rgb/{t}.png\n")
            fd.write(f"{t*0.1+0.005:.6f} depth/{t}.png\n")
    return root, world


def test_tum_loader(tum_dir):
    root, world = tum_dir
    ds = datasets.TumRgbdDataset(str(root))
    assert len(ds) == 4
    frames = list(ds)
    assert frames[0].is_depth
    # Depth decodes back to meters (uint16 @ 1/5000 m covers z < 13.1 m).
    _, depth = synthetic.render_depth_frame(world, 0)
    nz = (depth > 0) & (depth < 13.0)
    assert nz.any()
    assert np.abs(frames[0].img_right[nz] - depth[nz]).max() < 1e-3


def test_g2o_roundtrip(tmp_path):
    import jax.numpy as jnp
    from vslam_tpu.ops import lie

    rng = np.random.default_rng(3)
    poses = []
    T = np.eye(4)
    for _ in range(5):
        xi = np.concatenate([rng.normal(0, 0.5, 3), rng.normal(0, 0.1, 3)]).astype(np.float32)
        T = T @ np.asarray(lie.exp_se3(jnp.asarray(xi)), dtype=np.float64)
        poses.append(T)
    poses = np.stack(poses)
    edges = [(k, k + 1, np.linalg.inv(poses[k]) @ poses[k + 1], 1.0) for k in range(4)]
    edges.append((4, 0, np.linalg.inv(poses[4]) @ poses[0], 10.0))

    p = str(tmp_path / "graph.g2o")
    g2o_io.write_pose_graph(p, poses, edges)
    poses2, edges2 = g2o_io.read_pose_graph(p)
    np.testing.assert_allclose(poses2[:, :3, 3], poses[:, :3, 3], atol=1e-6)
    np.testing.assert_allclose(poses2[:, :3, :3], poses[:, :3, :3], atol=1e-4)
    assert len(edges2) == 5
    assert edges2[-1][3] == pytest.approx(10.0)
    # lines are g2o-standard records
    head = open(p).readline().split()
    assert head[0] == "VERTEX_SE3:QUAT"


def test_cli_run_and_eval(kitti_dir, tmp_path):
    """Drive the CLI end-to-end on the KITTI fixture (app.cpp role)."""
    root, world = kitti_dir
    out = tmp_path / "est.txt"
    timing = tmp_path / "timing.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "vslam_tpu", "run",
         "--dataset", str(root), "--format", "kitti", "--open-loop",
         "--output-kitti", str(out), "--timing-output", str(timing)],
        capture_output=True, text=True, env=env, timeout=500, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and timing.exists()
    est = traj_eval.read_kitti(str(out))
    assert len(est) == 6

    r2 = subprocess.run(
        [sys.executable, "-m", "vslam_tpu", "eval",
         "--estimate", str(out), "--ground-truth", str(root / "gt.txt")],
        capture_output=True, text=True, env=env, timeout=300, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    import json
    metrics = json.loads(r2.stdout.strip().splitlines()[-1])
    assert metrics["n_poses"] == 6
    assert metrics["ate_rmse_m"] < 0.2


def test_factor_graph_roundtrip(tmp_path):
    """write_factor_graph emits poses + landmark vertices + measurement
    edges that read back exactly (writePoseGraphToFile parity)."""
    from vslam_tpu.io import g2o_io

    rng = np.random.default_rng(4)
    P = 4
    poses = np.tile(np.eye(4, dtype=np.float64), (P, 1, 1))
    for k in range(P):
        poses[k][:3, 3] = rng.normal(0, 2, 3)
    odo = [
        (k - 1, k, np.linalg.inv(poses[k - 1]) @ poses[k], 1.0)
        for k in range(1, P)
    ]
    lms = {7: np.array([1.0, 2.0, 3.0]), 42: np.array([-1.0, 0.5, 9.0])}
    obs = [
        (0, 7, np.array([0.5, 0.5, 4.0]), 0.25),
        (1, 42, np.array([-0.5, 0.2, 8.0]), 0.125),
    ]
    path = str(tmp_path / "fg.g2o")
    g2o_io.write_factor_graph(path, poses, odo, lms, obs,
                              identifier_space=1000)
    p2, e2, l2, o2 = g2o_io.read_factor_graph(path)
    assert len(p2) == P
    np.testing.assert_allclose(p2[:, :3, 3], poses[:, :3, 3], atol=1e-6)
    assert set(l2) == {1007, 1042}
    np.testing.assert_allclose(l2[1007], lms[7], atol=1e-6)
    assert len(o2) == 2
    kf, gid, p_kf, info = o2[0]
    assert (kf, gid) == (0, 1007)
    np.testing.assert_allclose(p_kf, obs[0][2], atol=1e-6)
    assert abs(info - 0.25) < 1e-6
    assert len(e2) == P - 1
