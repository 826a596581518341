"""Visualization smoke tests: files are produced and well-formed."""

import os

import numpy as np

from vslam_tpu.viz import plots

RNG = np.random.default_rng(33)


def test_frame_overlay(tmp_path):
    img = RNG.uniform(0, 255, (120, 160)).astype(np.float32)
    uv = RNG.uniform(10, 100, (30, 2)).astype(np.float32)
    has_lm = RNG.random(30) > 0.5
    valid = np.ones(30, bool)
    p = str(tmp_path / "overlay.png")
    plots.draw_frame_overlay(img, uv, has_lm, valid, proj_uv=uv + 3.0, path=p)
    assert os.path.getsize(p) > 1000


def test_topdown_plot(tmp_path):
    traj = np.cumsum(RNG.normal(0, 0.3, (50, 3)), axis=0)
    gt = traj + RNG.normal(0, 0.05, traj.shape)
    lms = RNG.uniform(-10, 10, (500, 3))
    p = str(tmp_path / "map.png")
    plots.plot_trajectory_topdown(traj, gt, landmarks=lms, path=p)
    assert os.path.getsize(p) > 5000
