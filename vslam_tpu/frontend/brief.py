"""Dense BRIEF-256: gather-free binary description for the whole image.

The reference's default descriptor is plain (unrotated) BRIEF-256
(base_framepoint_generator.cpp:184-197, descriptor_type "BRIEF").  On TPU
the per-keypoint gather formulation (orb.py) is bottlenecked by ~3M random
loads per frame; BRIEF's fixed integer offsets admit a dense formulation
that is pure VPU work:

    bit_b(x) = [ S(x + o1_b) < S(x + o2_b) ]           (S = smoothed image)

Each bit plane is one shifted-image comparison over the full image; 32
planes pack into one uint32 map, eight maps hold all 256 bits.  Keypoint
descriptors are then an 8-word row lookup — K x 8 loads instead of K x 3k.
Measured ~40x faster than the gather path on TPU v5e at 376x1241.

Orientation invariance is lost (as in the reference's default); the
rotation-aware gather path remains available as descriptor_type "ORB256".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.frontend.orb import PATTERN_RADIUS, _make_pattern, box_blur

# Integer BRIEF offsets from the same seeded pattern as the ORB path.
_PAT = np.round(_make_pattern()).astype(np.int32)  # (256, 2, 2) [bit, pt, (dr, dc)]


def _difference_filters() -> np.ndarray:
    """(256, 1, P, P) one-hot difference filters: +1 at o2, -1 at o1, so
    conv(img, filter_b) = S(x + o2_b) - S(x + o1_b) and
    bit_b = [ conv > 0 ]."""
    R = PATTERN_RADIUS
    P = 2 * R + 1
    f = np.zeros((256, 1, P, P), np.float32)
    for b in range(256):
        dr1, dc1 = _PAT[b, 0]
        dr2, dc2 = _PAT[b, 1]
        f[b, 0, R + dr1, R + dc1] += -1.0
        f[b, 0, R + dr2, R + dc2] += 1.0
    return f


_FILTERS = jnp.asarray(_difference_filters())  # (256, 1, P, P)


@jax.jit
def dense_bit_planes(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) image -> (8, H, W) uint32 packed BRIEF bit planes.

    Formulated as four 64-filter convolutions (one compact MXU op each —
    a 512-op shifted-compare graph takes the compiler minutes and the VPU
    longer than the systolic array takes to do the same work as im2col
    matmuls); each chunk packs immediately to bound peak memory at
    64 x H x W f32."""
    smooth = box_blur(img, radius=2)
    H, W = img.shape
    x = smooth[None, None]  # NCHW
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = []
    for chunk in range(4):  # 64 bits at a time -> one uint32 pair
        filt = _FILTERS[chunk * 64 : (chunk + 1) * 64]
        diff = jax.lax.conv_general_dilated(
            x, filt, (1, 1),
            padding=[(PATTERN_RADIUS, PATTERN_RADIUS)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.DEFAULT,
        )[0]  # (64, H, W)
        bits = (diff > 0).astype(jnp.uint32)
        lo = jnp.sum(bits[:32] << shifts[:, None, None], axis=0)
        hi = jnp.sum(bits[32:] << shifts[:, None, None], axis=0)
        words.extend([lo, hi])
    return jnp.stack(words)


def _use_pallas() -> bool:
    """The shifted-compare Pallas kernel runs on TPU only; CPU (tests) and
    other backends keep the conv formulation."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover - backend probing never fatal
        return False


def describe_dense(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Packed descriptors at (rounded) keypoint coordinates.

    img: (H, W) f32; uv: (K, 2) [col, row].  Returns (K, 8) uint32.
    """
    if _use_pallas():
        from vslam_tpu.frontend.pallas_brief import dense_bit_planes_pallas

        planes = dense_bit_planes_pallas(box_blur(img, radius=2))
    else:
        planes = dense_bit_planes(img)  # (8, H, W)
    return _gather_planes(planes, img.shape, uv)


def _gather_planes(planes, shape, uv):
    H, W = shape
    c = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    r = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    return planes[:, r, c].T  # (K, 8)


def dense_planes(img: jnp.ndarray) -> jnp.ndarray:
    """Packed BRIEF bit planes for ONE image: (8, H, W) uint32 (the RGB-D
    pipeline's variant of dense_planes_pair — depth mode has no right
    image to describe)."""
    if _use_pallas():
        from vslam_tpu.frontend.pallas_brief import dense_bit_planes_pallas

        return dense_bit_planes_pallas(box_blur(img, 2))
    return dense_bit_planes(img)


def dense_planes_pair(img_l, img_r) -> jnp.ndarray:
    """Packed BRIEF bit planes for a stereo pair: (2, 8, H, W) uint32.

    One Pallas launch on TPU, the conv formulation elsewhere.  Keeping the
    planes around lets later stages re-describe ARBITRARY pixel positions
    with a single gather — the mechanism behind landmark recovery
    (reference recoverPoints re-extracts descriptors at projected landmark
    coordinates, stereo_framepoint_generator.cpp:683-869).
    """
    if _use_pallas():
        from vslam_tpu.frontend.pallas_brief import dense_bit_planes_pallas_batch

        sm = jnp.stack([box_blur(img_l, 2), box_blur(img_r, 2)])
        return dense_bit_planes_pallas_batch(sm)  # (2, 8, H, W)
    return jnp.stack([dense_bit_planes(img_l), dense_bit_planes(img_r)])


def gather_descriptors(planes: jnp.ndarray, shape, uv: jnp.ndarray) -> jnp.ndarray:
    """Descriptors at (rounded) pixel coordinates from precomputed planes."""
    return _gather_planes(planes, shape, uv)


def describe_dense_pair(img_l, img_r, uv_l, uv_r):
    """Both stereo images in one device program (one Pallas launch on TPU).

    Returns (desc_l (K,8) uint32, desc_r (K,8) uint32).
    """
    planes = dense_planes_pair(img_l, img_r)
    return (
        _gather_planes(planes[0], img_l.shape, uv_l),
        _gather_planes(planes[1], img_r.shape, uv_r),
    )
