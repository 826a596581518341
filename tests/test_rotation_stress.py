"""Rotation / lighting stress: full-engine run under in-plane camera roll
with drifting illumination (VERDICT r3 #8 — realism hardening).

The reference's detector/descriptor family exists to survive exactly this
regime (base_framepoint_generator.cpp:28-136); here BRIEF256R (rotated-
pattern-bank oriented descriptors) + pyramid octaves must keep the full
engine tracking through ±15 deg of roll oscillation and a ±20% lighting
ramp with a bounded ATE.
"""

import numpy as np
import jax.numpy as jnp

import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

from vslam_tpu.io import synthetic
from vslam_tpu.io.config import ParameterCollection
from vslam_tpu.ops import camera as cam_ops
from vslam_tpu.eval import trajectory as traj_eval

CAM = cam_ops.make_camera(fx=500.0, fy=500.0, cx=320.0, cy=160.0,
                          baseline_m=0.4, rows=320, cols=640)


def test_engine_tracks_through_roll_and_lighting():
    from vslam_tpu.system.engine import SlamEngine

    n = 32
    poses, rolls = synthetic.roll_trajectory(
        n, step=0.35, roll_amplitude_deg=15.0, roll_period=16
    )
    world = synthetic.make_world(CAM, n_points=3500, seed=11, poses=poses)

    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 512
    cfg.framepoint_generation.bin_size_pixels = 12
    cfg.framepoint_generation.descriptor_type = "BRIEF256R"
    cfg.framepoint_generation.detector_number_of_octaves = 2
    cfg.command_line.option_disable_relocalization = True

    eng = SlamEngine(CAM, cfg, landmark_capacity=16384)
    for t in range(n):
        gain = 1.0 + 0.2 * np.sin(2 * np.pi * t / n)  # ±20% lighting drift
        img_l, img_r, _ = synthetic.render_stressed(
            world, t, roll_rad=float(rolls[t]), gain=gain, offset=5.0 * np.sin(t)
        )
        eng.process(img_l, img_r)
    est = eng.trajectory
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)
    path = float(np.sum(np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)))
    rep = eng.report_lite()
    assert np.isfinite(est).all()
    assert rep["n_track_breaks"] == 0, rep
    # ATE bound: within 1.5% of the ~11 m path under combined stressors.
    assert rmse < 0.015 * path, (rmse, path)


# NOTE: descriptor-level rotation robustness of BRIEF256R is covered by
# tests/test_real_imagery.py::test_rotated_banks_survive_in_plane_rotation
# (full-image warpAffine on a real photo — the methodologically sound
# fixture; splat-world patch rotation leaves the background unrotated and
# contaminates the comparison).
