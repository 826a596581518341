"""Fused Pallas TPU front-end kernel: box blur + dense BRIEF-256 planes +
FAST corner score + 3x3 NMS in ONE pass over the image.

The XLA front-end pipeline reads/writes the full image many times
(shifted-stack FAST ~1.7 ms, box blur ~0.26 ms, separate BRIEF kernel
~2.3 ms per stereo pair on v5e at 376x1241).  All three are elementwise
shifted-window programs over the same pixels — this kernel walks row
bands once, keeps the band + halo in VMEM/registers, and emits

  * (8, H, W) uint32 packed BRIEF bit planes (from the box-blurred band),
  * (H, W) f32 NMS'd FAST-9/16 (or FAST-12) corner scores (from raw),

matching the XLA reference implementations bit-for-bit on the interior
(>= 16 px from the border; the detection border, default 20 px, masks the
divergent edge region — the XLA box blur edge-replicates where this
kernel's halo is zero-padded).

Reference behavior being fused: detector "FAST" + descriptor "BRIEF"
(base_framepoint_generator.cpp:9-25,184-197).

Contiguous-arc test without rotates: with the 16 ring compares packed
into one uint32 mask m and doubled as M = m | m<<16, a cyclic run of
>= 9 set bits exists iff any of the low 16 bits survive
A1=M&M>>1, A2=A1&A1>>2, A4=A2&A2>>4 (runs >= 8), arc9 = A4 & M>>8.
(Left shifts are strength-reduced to multiplies: Mosaic miscompiles
uint32 `<<` by constants >= 16 on v5e — see pallas_brief.py.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vslam_tpu.frontend.detect import CIRCLE
from vslam_tpu.frontend.orb import PATTERN_RADIUS

_R = PATTERN_RADIUS  # 13 — BRIEF offsets lie in [-R, R]
_BLUR = 2  # box blur radius (orb.box_blur default)
_PAD = 16  # halo: R + blur + 1 (NMS) = 16
_BAND = 16  # output rows per grid step
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shl(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """uint32 left shift by constant via multiply (Mosaic << bug)."""
    return x * np.uint32(1 << k)


def _make_kernel(pat: np.ndarray, band: int, w_out: int, arc_len: int,
                 H: int, W: int, border: int, bin_size: int):
    """pat: (256, 2, 2) int BRIEF offsets [bit, point, (dr, dc)]."""
    nb = band + 2 * _R  # blurred rows needed (output band +- R)
    nf = band + 2  # FAST score rows needed (output band +- 1 for NMS)
    k = 2 * _BLUR + 1
    # Border/crop mask constants for the in-kernel row reduction (the XLA
    # binning tail crops to bin_size multiples and masks the detection
    # border BEFORE the per-bin argmax — detect.keypoints_from_score).
    Hc = (H // bin_size) * bin_size
    Wc = (W // bin_size) * bin_size

    def kernel(thr_ref, img_ref, planes_ref, score_ref, rowmax_ref,
               rowarg_ref):
        t = thr_ref[0]
        i = pl.program_id(1)
        # Raw rows covering the output band plus the full halo.
        raw = img_ref[0, pl.ds(i * band, band + 2 * _PAD), :]  # (band+32, Wi)

        # ---- box blur, order-matched to orb.box_blur (sum rows asc / k,
        # then cols asc / k) so interior planes are bit-identical --------
        # Blurred row r (rel. to output band, r in [-R, band+R)) uses raw
        # rows r-2..r+2; raw row r is at offset _PAD + r in `raw`.
        r0 = _PAD - _R - _BLUR  # raw offset of first needed row
        rows = raw[r0 + 0 : r0 + nb + 2 * _BLUR, :]
        acc = rows[0:nb, :]
        for d in range(1, k):
            acc = acc + rows[d : d + nb, :]
        rowsum = acc * np.float32(1.0 / k)  # (nb, Wi)
        c0 = _PAD - _R - _BLUR  # col offset handled below per-slice
        # Columns: blurred col c uses rowsum cols c-2..c+2 (absolute).
        # Keep the full width; BRIEF taps slice with their own offsets.
        w_s = w_out + 2 * _R  # smoothed cols needed: output +- R
        cc0 = _PAD - _R - _BLUR
        acc = jax.lax.slice(rowsum, (0, cc0), (nb, cc0 + w_s))
        for d in range(1, k):
            acc = acc + jax.lax.slice(rowsum, (0, cc0 + d), (nb, cc0 + d + w_s))
        smooth = acc * np.float32(1.0 / k)  # (nb, w_s): rows -R.., cols -R..

        # ---- BRIEF-256 packed planes ------------------------------------
        def stap(dr: int, dc: int) -> jnp.ndarray:
            return jax.lax.slice(
                smooth, (_R + dr, _R + dc), (_R + dr + band, _R + dc + w_out)
            )

        for w in range(8):
            acc = jnp.zeros((band, w_out), jnp.uint32)
            for j in range(32):
                b = w * 32 + j
                a = stap(int(pat[b, 0, 0]), int(pat[b, 0, 1]))
                c = stap(int(pat[b, 1, 0]), int(pat[b, 1, 1]))
                acc = acc + (a < c).astype(jnp.uint32) * np.uint32(1 << j)
            planes_ref[0, w] = acc

        # ---- FAST segment-test score + excess, rows -1..band+1 ----------
        def ftap(dr: int, dc: int) -> jnp.ndarray:
            # score row r (r in [-1, band+1)) at raw offset _PAD + r.
            return jax.lax.slice(
                raw,
                (_PAD - 1 + dr, _PAD + dc),
                (_PAD - 1 + dr + nf, _PAD + dc + w_out),
            )

        center = ftap(0, 0)
        hi = center + t
        lo = center - t
        mb = jnp.zeros((nf, w_out), jnp.uint32)
        md = jnp.zeros((nf, w_out), jnp.uint32)
        bright_excess = jnp.zeros((nf, w_out), jnp.float32)
        dark_excess = jnp.zeros((nf, w_out), jnp.float32)
        for kk in range(16):
            dr, dc = int(CIRCLE[kk, 0]), int(CIRCLE[kk, 1])
            v = ftap(dr, dc)
            mb = mb + _shl((v > hi).astype(jnp.uint32), kk)
            md = md + _shl((v < lo).astype(jnp.uint32), kk)
            bright_excess = bright_excess + jnp.maximum(v - hi, 0.0)
            dark_excess = dark_excess + jnp.maximum(lo - v, 0.0)

        def arc(m: jnp.ndarray) -> jnp.ndarray:
            M = m + _shl(m, 16)  # doubled cyclic mask (m has 16 bits)
            a = M & (M // np.uint32(2))  # runs >= 2
            a = a & (a // np.uint32(4))  # runs >= 4
            a = a & (a // np.uint32(16))  # runs >= 8
            if arc_len == 9:
                a = a & (M // np.uint32(256))  # + bit i+8 -> runs >= 9
            else:  # FAST-12: bits i..i+7 and i+8..i+11
                a12 = M & (M // np.uint32(2))
                a12 = a12 & (a12 // np.uint32(4))  # runs >= 4 at i+8
                a = a & (a12 // np.uint32(256))
            return (a & np.uint32(0xFFFF)) > 0

        is_corner = arc(mb) | arc(md)
        score = jnp.where(
            is_corner, jnp.maximum(bright_excess, dark_excess), 0.0
        )  # (nf, w_out) rows -1..band+1

        # ---- 3x3 NMS (keep score >= neighborhood max) -------------------
        # Column-neighbor max via lane rotations (Mosaic cannot lower a
        # lane-dim concat): the two edge columns see WRAPPED neighbors,
        # which the detection border (>= 16 px) masks downstream.
        s_l = pltpu.roll(score, 1, 1)
        s_r = pltpu.roll(score, w_out - 1, 1)
        colmax = jnp.maximum(jnp.maximum(s_l, score), s_r)  # (nf, w_out)
        neigh = jnp.maximum(
            jnp.maximum(colmax[0:band, :], colmax[1 : band + 1, :]),
            colmax[2 : band + 2, :],
        )
        mid = score[1 : band + 1, :]
        nms = jnp.where(mid >= neigh, mid, 0.0)
        score_ref[0] = nms

        # ---- in-kernel row reduction for the binning tail ---------------
        # Mask the detection border and the bin-grid crop, then reduce the
        # band's rows to a per-column (max, argrow) pair: the XLA binning
        # tail then works on an (n_bands, W) array instead of the full
        # image (the image-sized bin transpose/argmax cost ~0.85 ms/image).
        rows = (
            jax.lax.broadcasted_iota(jnp.int32, (band, w_out), 0)
            + i * band
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (band, w_out), 1)
        inside = (
            (rows >= border) & (rows < min(H - border, Hc))
            & (cols >= border) & (cols < min(W - border, Wc))
        )
        masked = jnp.where(inside, nms, 0.0)
        rmax = jnp.max(masked, axis=0, keepdims=True)  # (1, w_out)
        # Smallest row index achieving the max (ties -> first row).
        local = jax.lax.broadcasted_iota(jnp.int32, (band, w_out), 0)
        cand = jnp.where(masked >= rmax, local, band)
        rowmax_ref[0, 0] = rmax
        rowarg_ref[0, 0] = jnp.min(cand, axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("arc_len", "border", "bin_size",
                                   "interpret"))
def fast_brief_frontend_pair(
    imgs: jnp.ndarray,
    threshold: jnp.ndarray,
    *,
    arc_len: int = 9,
    border: int = 20,
    bin_size: int = 16,
    interpret: bool = False,
):
    """Fused front-end for an image stack.

    imgs: (B, H, W) f32 raw images (a stereo pair is B=2).
    threshold: f32 scalar FAST threshold (host-controlled, traced).

    Returns (planes (B, 8, H, W) uint32, score (B, H, W) f32 NMS'd,
    rowmax (B, n_bands, Wo) f32, rowarg (B, n_bands, Wo) int32) — the
    row-reduced pair feeds keypoints_from_band_reduction when
    bin_size == 16 (the kernel band height); score feeds the generic
    detect.keypoints_from_score otherwise.
    Interior-exact vs the XLA path (nms3(fast_score_map(img)) and
    box_blur+dense BRIEF) at >= 16 px from the border.
    """
    from vslam_tpu.frontend.brief import _PAT

    B, H, W = imgs.shape
    band = _BAND
    Hb = _round_up(H, band)
    Wo = _round_up(W, _LANE)
    Wi = _round_up(Wo + 2 * _PAD, _LANE)
    Hi = _round_up(Hb + 2 * _PAD, 8)
    n_bands = Hb // band

    padded = jnp.zeros((B, Hi, Wi), jnp.float32)
    padded = jax.lax.dynamic_update_slice(
        padded, imgs.astype(jnp.float32), (0, _PAD, _PAD)
    )
    thr = jnp.reshape(threshold.astype(jnp.float32), (1,))

    kernel = _make_kernel(np.asarray(_PAT), band, Wo, arc_len, H, W, border,
                          bin_size)
    planes, score, rowmax, rowarg = pl.pallas_call(
        kernel,
        grid=(B, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, Hi, Wi), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 8, band, Wo), lambda b, i: (b, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, band, Wo), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, Wo), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, Wo), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 8, Hb, Wo), jnp.uint32),
            jax.ShapeDtypeStruct((B, Hb, Wo), jnp.float32),
            jax.ShapeDtypeStruct((B, n_bands, 1, Wo), jnp.float32),
            jax.ShapeDtypeStruct((B, n_bands, 1, Wo), jnp.int32),
        ),
        # The default 16 MB scoped-vmem cap is ~0.8 MB short when this
        # kernel is vmapped (batched chunk front-end); the physical VMEM
        # budget is comfortably larger.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(thr, padded)
    return (planes[:, :, :H, :W], score[:, :H, :W], rowmax[:, :, 0, :],
            rowarg[:, :, 0, :])


def keypoints_from_band_reduction(rowmax, rowarg, H, W, bin_size, capacity):
    """Binning tail over the kernel's row-reduced (n_bands, Wo) arrays —
    per-bin argmax + top-K at ~1/16 the element count of the image-sized
    path (detect.keypoints_from_score).  Requires bin_size == _BAND.

    Tie-breaking differs from the image-sized path: equal scores inside a
    bin resolve to the smallest row then smallest column (vs row-major
    first occurrence) — identical on real-valued score maps.

    Returns (uv (K, 2) f32, score (K,), valid (K,) bool).
    """
    assert bin_size == _BAND
    n_bands, Wo = rowmax.shape
    groups = Wo // bin_size
    gm = rowmax.reshape(n_bands, groups, bin_size)
    cell_score = jnp.max(gm, axis=2)  # (n_bands, groups)
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_bands, groups, bin_size), 2
    )
    cand = jnp.where(gm >= cell_score[:, :, None], col_iota, bin_size)
    cell_col = jnp.min(cand, axis=2)  # in-group column

    flat_score = cell_score.reshape(-1)
    n_cells = flat_score.shape[0]
    k = min(capacity, n_cells)
    top_score, top_cell = jax.lax.top_k(flat_score, k)
    cell_r = top_cell // groups
    cell_c = top_cell % groups
    u = cell_c * bin_size + cell_col.reshape(-1)[top_cell]
    v = cell_r * _BAND + rowarg.reshape(-1)[
        cell_r * Wo + u
    ]
    uv = jnp.stack([u, v], axis=1).astype(jnp.float32)
    valid = top_score > 0.0
    if k < capacity:
        pad = capacity - k
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), jnp.float32)])
        top_score = jnp.concatenate([top_score, jnp.zeros(pad, jnp.float32)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return uv, top_score, valid
