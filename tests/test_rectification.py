"""EuRoC-style undistortion/rectification: numpy map construction against
the cv2 oracle, geometric dot-transport through the full warp, and the
EuRoC loader picking up sensor.yaml calibration."""

import os

import numpy as np
import pytest

from vslam_tpu.io import rectification as rect

cv2 = pytest.importorskip("cv2")

K = np.array([[458.654, 0.0, 367.215],
              [0.0, 457.296, 248.375],
              [0.0, 0.0, 1.0]])
DIST = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
SIZE = (752, 480)  # (cols, rows)


def test_numpy_maps_match_cv2():
    """_build_map_numpy reproduces cv2.initUndistortRectifyMap."""
    R = np.eye(3)
    P = K.copy()
    mu, mv = rect._build_map_numpy(K, DIST, R, P, SIZE)
    cu, cv_ = cv2.initUndistortRectifyMap(
        K, DIST, R, P, SIZE, cv2.CV_32FC1
    )
    np.testing.assert_allclose(mu, cu, atol=1e-2)
    np.testing.assert_allclose(mv, cv_, atol=1e-2)


def test_undistortion_transports_points():
    """A dot painted at the DISTORTED projection of a 3D point lands at the
    ideal pinhole projection after rectification."""
    rig = rect.StereoRectifier.identity_test_rig(K, DIST, SIZE)
    pts = np.array([[0.5, 0.2, 4.0], [-0.8, -0.3, 6.0], [0.1, 0.45, 3.0]])
    raw = np.zeros((SIZE[1], SIZE[0]), np.float32)
    expected = []
    for X in pts:
        x, y = X[0] / X[2], X[1] / X[2]
        xd, yd = rect._distort_radtan(x, y, DIST)
        ud = K[0, 0] * xd + K[0, 2]
        vd = K[1, 1] * yd + K[1, 2]
        raw[int(round(vd)), int(round(ud))] = 255.0
        expected.append((K[0, 0] * x + K[0, 2], K[1, 1] * y + K[1, 2]))
    out = rig.rectify(raw, 0)
    for (ue, ve) in expected:
        v, u = np.unravel_index(np.argmax(out), out.shape)
        # Integer-pixel painting + bilinear warp: within ~1.5 px.
        assert abs(u - ue) < 1.5 and abs(v - ve) < 1.5, ((u, v), (ue, ve))
        out[max(v - 3, 0) : v + 4, max(u - 3, 0) : u + 4] = 0.0


def _write_sensor_yaml(path, K_, dist, T_BS):
    import yaml

    doc = {
        "sensor_type": "camera",
        "T_BS": {"rows": 4, "cols": 4, "data": [float(v) for v in T_BS.reshape(-1)]},
        "rate_hz": 20,
        "resolution": [SIZE[0], SIZE[1]],
        "camera_model": "pinhole",
        "intrinsics": [float(K_[0, 0]), float(K_[1, 1]), float(K_[0, 2]), float(K_[1, 2])],
        "distortion_model": "radial-tangential",
        "distortion_coefficients": [float(v) for v in dist],
    }
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


def test_euroc_loader_rectifies(tmp_path):
    """Loader with sensor.yaml present builds a rectifier, outputs a
    rectified CameraParams, and actually warps the frames."""
    mav = tmp_path / "mav0"
    for c in ("cam0", "cam1"):
        (mav / c / "data").mkdir(parents=True)
    T_B_c0 = np.eye(4)
    T_B_c1 = np.eye(4)
    T_B_c1[0, 3] = 0.11  # 11 cm baseline along +x
    _write_sensor_yaml(mav / "cam0" / "sensor.yaml", K, DIST, T_B_c0)
    _write_sensor_yaml(mav / "cam1" / "sensor.yaml", K, DIST, T_B_c1)

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (SIZE[1], SIZE[0])).astype(np.uint8)
    cv2.imwrite(str(mav / "cam0" / "data" / "0.png"), img)
    cv2.imwrite(str(mav / "cam1" / "data" / "0.png"), img)
    with open(mav / "cam0" / "data.csv", "w") as f:
        f.write("#ts,filename\n0,0.png\n")

    from vslam_tpu.io.datasets import EurocDataset

    ds = EurocDataset(str(tmp_path))
    assert ds.rectifier is not None
    assert abs(float(ds.cam.baseline_m) - 0.11) < 0.02
    frame = next(iter(ds))
    assert frame.img_left.shape == (SIZE[1], SIZE[0])
    # The warp must have moved pixels (distortion is strong at the borders).
    assert np.abs(frame.img_left - img.astype(np.float32)).mean() > 1.0
