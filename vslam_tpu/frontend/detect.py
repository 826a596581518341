"""FAST-9/16 corner detection as a whole-image batched array program.

Replaces the reference's per-region OpenCV detector grid
(src/framepoint_generation/base_framepoint_generator.cpp:229-459): instead
of R independent cv::FastFeatureDetector calls over image sub-regions with
per-region threshold controllers, the whole image is processed in one
fused XLA program and spatial regularization is per-cell argmax binning
(one keypoint per bin cell, the reference's `bin_size_pixels` grid,
base_framepoint_generator.cpp:303-322) followed by a global top-K to a
fixed capacity.  The dynamic threshold controller stays on the host and
feeds the threshold in as a scalar array (no recompiles).

Segment test: a pixel is a corner when >= 9 contiguous pixels of the
16-pixel Bresenham circle are all brighter than center+t or all darker
than center-t.  Score = max over the two polarities of the summed
threshold excess (the standard GPU-FAST approximation of OpenCV's
max-threshold score).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, clockwise from 12 o'clock: (row, col) offsets.
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)
ARC_LEN = 9


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (SoA, masked)."""

    uv: jnp.ndarray  # (K, 2) f32 [u=col, v=row]
    score: jnp.ndarray  # (K,) f32 detector response
    valid: jnp.ndarray  # (K,) bool


def _shifted_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (16, H, W): circle neighbor values per pixel (zero-padded
    borders; border cells are masked out downstream)."""
    pad = 3
    padded = jnp.pad(img, pad)
    H, W = img.shape
    views = [
        jax.lax.dynamic_slice(padded, (pad + int(dr), pad + int(dc)), (H, W))
        for dr, dc in CIRCLE
    ]
    return jnp.stack(views, axis=0)


def fast_score_map(img: jnp.ndarray, threshold: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel FAST-9/16 corner score; 0 where not a corner.

    img: (H, W) f32.  threshold: scalar f32 (dynamic — host-controlled).
    """
    circ = _shifted_stack(img)  # (16, H, W)
    center = img[None]
    bright = circ > center + threshold
    dark = circ < center - threshold

    def arc_exists(mask):
        # contiguous run >= ARC_LEN on a ring: wrap-extend then window-sum.
        ext = jnp.concatenate([mask, mask[: ARC_LEN - 1]], axis=0).astype(jnp.int32)
        cs = jnp.cumsum(ext, axis=0)
        cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
        wsum = cs[ARC_LEN:] - cs[:-ARC_LEN]  # (16, H, W)
        return jnp.max(wsum, axis=0) == ARC_LEN

    is_corner = arc_exists(bright) | arc_exists(dark)
    bright_excess = jnp.sum(jnp.maximum(circ - center - threshold, 0.0), axis=0)
    dark_excess = jnp.sum(jnp.maximum(center - circ - threshold, 0.0), axis=0)
    score = jnp.maximum(bright_excess, dark_excess)
    return jnp.where(is_corner, score, 0.0)


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= neigh, score, 0.0)


@partial(jax.jit, static_argnames=("bin_size", "capacity", "border"))
def detect_keypoints(
    img: jnp.ndarray,
    threshold: jnp.ndarray,
    bin_size: int = 16,
    capacity: int = 1024,
    border: int = 20,
) -> Keypoints:
    """Full detection pipeline: score -> NMS -> per-bin argmax -> top-K.

    Returns keypoints at pixel-center coordinates, strongest first.
    """
    H, W = img.shape
    score = nms3(fast_score_map(img, threshold))

    # Mask out the border (descriptor patch margin).
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (
        (rows >= border) & (rows < H - border) & (cols >= border) & (cols < W - border)
    )
    score = jnp.where(inside, score, 0.0)

    # Per-bin argmax: crop to a multiple of bin_size, reshape to cells.
    Hc = (H // bin_size) * bin_size
    Wc = (W // bin_size) * bin_size
    sc = score[:Hc, :Wc].reshape(H // bin_size, bin_size, W // bin_size, bin_size)
    sc = sc.transpose(0, 2, 1, 3).reshape(-1, bin_size * bin_size)  # (cells, b*b)
    cell_best = jnp.argmax(sc, axis=1)
    cell_score = jnp.take_along_axis(sc, cell_best[:, None], axis=1)[:, 0]

    n_cells = sc.shape[0]
    k = min(capacity, n_cells)
    top_score, top_cell = jax.lax.top_k(cell_score, k)

    cells_w = W // bin_size
    cell_r = top_cell // cells_w
    cell_c = top_cell % cells_w
    in_r = jnp.take(cell_best, top_cell) // bin_size
    in_c = jnp.take(cell_best, top_cell) % bin_size
    v = cell_r * bin_size + in_r
    u = cell_c * bin_size + in_c

    uv = jnp.stack([u, v], axis=1).astype(jnp.float32)
    valid = top_score > 0.0
    if k < capacity:
        pad = capacity - k
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), jnp.float32)])
        top_score = jnp.concatenate([top_score, jnp.zeros(pad, jnp.float32)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return Keypoints(uv=uv, score=top_score, valid=valid)


class ThresholdController:
    """Host-side delta-proportional detector threshold controller.

    Reference: detectKeypoints' dynamic threshold targeting #bins keypoints
    per region, clamped per-step (base_framepoint_generator.cpp:355-459).
    Here a single controller for the whole image (regularization is done by
    binning, so only the global count needs controlling).
    """

    def __init__(
        self,
        initial: float = 20.0,
        target_count: int = 700,
        max_change: float = 10.0,
        minimum: float = 5.0,
        maximum: float = 100.0,
    ):
        self.threshold = float(initial)
        self.target = int(target_count)
        self.max_change = float(max_change)
        self.min = float(minimum)
        self.max = float(maximum)

    def update(self, detected_count: int) -> float:
        err = (detected_count - self.target) / max(self.target, 1)
        delta = float(np.clip(err * self.max_change, -self.max_change, self.max_change))
        self.threshold = float(np.clip(self.threshold + delta, self.min, self.max))
        return self.threshold
