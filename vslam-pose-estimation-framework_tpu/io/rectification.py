"""Stereo undistortion + rectification for raw (EuRoC-style) cameras.

The reference rectifies live camera input with cv2's
initUndistortRectifyMap (node.cpp:225-244); dataset playback assumes
pre-rectified imagery.  EuRoC ships RAW radial-tangential-distorted images
plus per-camera sensor.yaml calibration, so the loader must rectify before
the (rectified-stereo) pipeline sees the frames.

Host-side IO preprocessing: maps are precomputed once (cv2.stereoRectify
when available, a numpy Fusiello-style construction otherwise) and applied
per frame with cv2.remap / numpy bilinear sampling.  This is data loading,
not device compute, so OpenCV use here is idiomatic (same as the
reference's node).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import yaml

from vslam_tpu.ops import camera as cam_ops

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 ships in this environment
    cv2 = None


@dataclass
class RawCamera:
    """One camera's raw calibration (EuRoC sensor.yaml schema)."""

    K: np.ndarray  # (3, 3)
    dist: np.ndarray  # (4,) radtan [k1, k2, p1, p2]
    T_BS: np.ndarray  # (4, 4) body-from-sensor extrinsics
    resolution: tuple  # (cols, rows)


def load_sensor_yaml(path: str) -> RawCamera:
    with open(path) as f:
        doc = yaml.safe_load(f)
    fu, fv, cu, cv_ = doc["intrinsics"]
    K = np.array([[fu, 0, cu], [0, fv, cv_], [0, 0, 1]], np.float64)
    dist = np.asarray(doc.get("distortion_coefficients", [0, 0, 0, 0]), np.float64)
    T_BS = np.asarray(doc["T_BS"]["data"], np.float64).reshape(4, 4)
    cols, rows = doc["resolution"]
    return RawCamera(K=K, dist=dist, T_BS=T_BS, resolution=(cols, rows))


def _distort_radtan(x, y, d):
    """Apply radial-tangential distortion to normalized coords."""
    k1, k2, p1, p2 = d[:4]
    r2 = x * x + y * y
    rad = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return xd, yd


def _build_map_numpy(K, dist, R, P, size):
    """initUndistortRectifyMap equivalent: for each rectified pixel, the
    source coordinate in the raw image."""
    cols, rows = size
    u, v = np.meshgrid(np.arange(cols, dtype=np.float64),
                       np.arange(rows, dtype=np.float64))
    # Rectified pixel -> normalized ray in the rectified frame.
    x = (u - P[0, 2]) / P[0, 0]
    y = (v - P[1, 2]) / P[1, 1]
    ones = np.ones_like(x)
    ray = np.stack([x, y, ones], axis=-1) @ R  # R^T applied row-wise
    xs = ray[..., 0] / ray[..., 2]
    ys = ray[..., 1] / ray[..., 2]
    xd, yd = _distort_radtan(xs, ys, dist)
    map_u = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_v = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_u, map_v


def _remap_numpy(img, map_u, map_v):
    H, W = img.shape
    u0 = np.floor(map_u).astype(np.int32)
    v0 = np.floor(map_v).astype(np.int32)
    fu = map_u - u0
    fv = map_v - v0
    u0c = np.clip(u0, 0, W - 2)
    v0c = np.clip(v0, 0, H - 2)
    out = (
        img[v0c, u0c] * (1 - fu) * (1 - fv)
        + img[v0c, u0c + 1] * fu * (1 - fv)
        + img[v0c + 1, u0c] * (1 - fu) * fv
        + img[v0c + 1, u0c + 1] * fu * fv
    )
    oob = (map_u < 0) | (map_u > W - 1) | (map_v < 0) | (map_v > H - 1)
    return np.where(oob, 0.0, out).astype(np.float32)


class StereoRectifier:
    """Precomputed undistort+rectify maps for a raw stereo pair.

    After construction, `cam` holds the rectified pinhole CameraParams
    (single K, horizontal baseline) that the SLAM pipeline consumes, and
    `rectify(img, side)` warps a raw frame.
    """

    def __init__(self, cam0: RawCamera, cam1: RawCamera):
        cols, rows = cam0.resolution
        self.size = (cols, rows)
        # Relative pose cam1 <- cam0 from body extrinsics.
        T_c1_c0 = np.linalg.inv(cam1.T_BS) @ cam0.T_BS
        R = T_c1_c0[:3, :3]
        t = T_c1_c0[:3, 3]

        if cv2 is not None:
            R0, R1, P0, P1, _, _, _ = cv2.stereoRectify(
                cam0.K, cam0.dist, cam1.K, cam1.dist, (cols, rows),
                R, t.reshape(3, 1),
                flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
            )
            self.maps0 = cv2.initUndistortRectifyMap(
                cam0.K, cam0.dist, R0, P0, (cols, rows), cv2.CV_32FC1
            )
            self.maps1 = cv2.initUndistortRectifyMap(
                cam1.K, cam1.dist, R1, P1, (cols, rows), cv2.CV_32FC1
            )
        else:  # pragma: no cover - numpy fallback
            # Fusiello-style: mean rotation, shared K, baseline along x.
            R0 = R1 = np.eye(3)
            P0 = cam0.K.copy()
            P1 = cam1.K.copy()
            P1[0, 3] = -cam1.K[0, 0] * np.linalg.norm(t)
            self.maps0 = _build_map_numpy(cam0.K, cam0.dist, R0, P0, self.size)
            self.maps1 = _build_map_numpy(cam1.K, cam1.dist, R1, P1, self.size)
        baseline = abs(P1[0, 3] / P1[0, 0])
        self.cam = cam_ops.make_camera(
            fx=float(P0[0, 0]), fy=float(P0[1, 1]),
            cx=float(P0[0, 2]), cy=float(P0[1, 2]),
            baseline_m=float(baseline), rows=rows, cols=cols,
        )

    @classmethod
    def identity_test_rig(cls, K, dist, size, baseline=0.11):
        """A rectifier for a single already-aligned camera pair with known
        distortion — used by tests to validate pure undistortion."""
        rig = cls.__new__(cls)
        cols, rows = size
        rig.size = size
        P = np.asarray(K, np.float64)
        rig.maps0 = _build_map_numpy(K, dist, np.eye(3), P, size)
        rig.maps1 = rig.maps0
        rig.cam = cam_ops.make_camera(
            fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]),
            cy=float(K[1, 2]), baseline_m=baseline, rows=rows, cols=cols,
        )
        return rig

    def rectify(self, img: np.ndarray, side: int) -> np.ndarray:
        maps = self.maps0 if side == 0 else self.maps1
        if cv2 is not None:
            return cv2.remap(
                img.astype(np.float32), maps[0], maps[1], cv2.INTER_LINEAR
            )
        return _remap_numpy(img.astype(np.float32), maps[0], maps[1])


def rectifier_from_euroc(mav_dir: str) -> StereoRectifier | None:
    """Build a rectifier from mav0/cam{0,1}/sensor.yaml; None if absent."""
    y0 = os.path.join(mav_dir, "cam0", "sensor.yaml")
    y1 = os.path.join(mav_dir, "cam1", "sensor.yaml")
    if not (os.path.exists(y0) and os.path.exists(y1)):
        return None
    return StereoRectifier(load_sensor_yaml(y0), load_sensor_yaml(y1))
