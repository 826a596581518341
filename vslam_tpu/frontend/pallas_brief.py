"""Pallas TPU kernel: dense packed BRIEF-256 bit planes.

The dense BRIEF formulation (brief.py) computes, for every pixel x,

    bit_b(x) = [ S(x + o1_b) < S(x + o2_b) ]        (S = box-smoothed image)

and packs the 256 bits into eight uint32 planes.  The XLA fallback
expresses this as four 64-filter difference convolutions; with a single
input channel the MXU runs at ~2% utilization (~63 ms per 376x1241 image
on v5e).  The useful work is only H*W*256 compares — pure VPU material.

This kernel does exactly that: the whole smoothed image sits in VMEM
(~2.3 MB), the grid walks row bands, and each band evaluates the 256
statically-unrolled shifted compares (offsets are compile-time constants
from the BRIEF pattern), OR-ing bits into uint32 accumulators in
registers.  Total HBM traffic is one image read + one 8-plane write.

Reference behavior: descriptor_type "BRIEF" in the reference front-end
(base_framepoint_generator.cpp:184-197).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vslam_tpu.frontend.orb import PATTERN_RADIUS

_R = PATTERN_RADIUS  # 13: offsets lie in [-R, R]
_BAND = 8  # output rows per grid step (keeps Mosaic VMEM stack small)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(pat: np.ndarray, n_band_rows: int, w_out: int):
    """Kernel closure over the static BRIEF offsets.

    pat: (256, 2, 2) int offsets [bit, point, (dr, dc)].
    """

    def kernel(img_ref, out_ref):
        i = pl.program_id(0)
        # (BAND + 2R, W_in) slice of the VMEM-resident padded image.
        band = img_ref[pl.ds(i * n_band_rows, n_band_rows + 2 * _R), :]

        def tap(dr: int, dc: int) -> jnp.ndarray:
            return jax.lax.slice(
                band,
                (_R + dr, _R + dc),
                (_R + dr + n_band_rows, _R + dc + w_out),
            )

        for w in range(8):
            acc = jnp.zeros((n_band_rows, w_out), jnp.uint32)
            for j in range(32):
                b = w * 32 + j
                a = tap(int(pat[b, 0, 0]), int(pat[b, 0, 1]))
                c = tap(int(pat[b, 1, 0]), int(pat[b, 1, 1]))
                # Multiply by 2^j, NOT `<< j`: Mosaic miscompiles uint32
                # shift-left by constants >= 16 (observed on v5e, bits land
                # in the wrong positions); the strength-reduced multiply is
                # compiled correctly and equally fast.
                acc = acc + (a < c).astype(jnp.uint32) * np.uint32(1 << j)
            out_ref[w] = acc

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def dense_bit_planes_pallas(
    smooth: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """(H, W) box-smoothed f32 image -> (8, H, W) uint32 BRIEF planes.

    Border pixels (within PATTERN_RADIUS of the edge) see zero padding;
    detection borders exceed the pattern radius so those planes are never
    gathered.
    """
    from vslam_tpu.frontend.brief import _PAT  # rounded integer offsets

    H, W = smooth.shape
    Hb = _round_up(H, _BAND)
    Wo = _round_up(W, _LANE)
    Wi = _round_up(Wo + 2 * _R, _LANE)
    Hi = _round_up(Hb + 2 * _R, 8)

    padded = jnp.zeros((Hi, Wi), smooth.dtype)
    padded = jax.lax.dynamic_update_slice(padded, smooth, (_R, _R))

    n_bands = Hb // _BAND
    kernel = _make_kernel(np.asarray(_PAT), _BAND, Wo)
    planes = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((Hi, Wi), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (8, _BAND, Wo), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, Hb, Wo), jnp.uint32),
        interpret=interpret,
    )(padded)
    return planes[:, :H, :W]


@partial(jax.jit, static_argnames=("bank", "interpret"))
def dense_bit_planes_pallas_pattern(
    smooth: jnp.ndarray, bank: int, *, interpret: bool = False
) -> jnp.ndarray:
    """Like dense_bit_planes_pallas but with the ROTATED pattern of the
    given bank (BRIEF256R banks, brief._ROT_PATS) — each bank compiles its
    own kernel with its offsets as compile-time constants."""
    from vslam_tpu.frontend.brief import _ROT_PATS

    H, W = smooth.shape
    Hb = _round_up(H, _BAND)
    Wo = _round_up(W, _LANE)
    Wi = _round_up(Wo + 2 * _R, _LANE)
    Hi = _round_up(Hb + 2 * _R, 8)

    padded = jnp.zeros((Hi, Wi), smooth.dtype)
    padded = jax.lax.dynamic_update_slice(padded, smooth, (_R, _R))

    n_bands = Hb // _BAND
    kernel = _make_kernel(np.asarray(_ROT_PATS[bank]), _BAND, Wo)
    planes = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((Hi, Wi), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (8, _BAND, Wo), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, Hb, Wo), jnp.uint32),
        interpret=interpret,
    )(padded)
    return planes[:, :H, :W]


def _make_batch_kernel(pat: np.ndarray, n_band_rows: int, w_out: int):
    def kernel(img_ref, out_ref):
        i = pl.program_id(1)
        band = img_ref[0, pl.ds(i * n_band_rows, n_band_rows + 2 * _R), :]

        def tap(dr: int, dc: int) -> jnp.ndarray:
            return jax.lax.slice(
                band,
                (_R + dr, _R + dc),
                (_R + dr + n_band_rows, _R + dc + w_out),
            )

        for w in range(8):
            acc = jnp.zeros((n_band_rows, w_out), jnp.uint32)
            for j in range(32):
                b = w * 32 + j
                a = tap(int(pat[b, 0, 0]), int(pat[b, 0, 1]))
                c = tap(int(pat[b, 1, 0]), int(pat[b, 1, 1]))
                # 2^j multiply, not `<< j` — see _make_kernel.
                acc = acc + (a < c).astype(jnp.uint32) * np.uint32(1 << j)
            out_ref[0, w] = acc

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def dense_bit_planes_pallas_batch(
    smooth: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """(B, H, W) box-smoothed f32 stack -> (B, 8, H, W) uint32 planes.

    One kernel launch for the whole stereo pair: the batch index is the
    outer (slow) grid dimension, so each image is DMA'd into VMEM once.
    """
    from vslam_tpu.frontend.brief import _PAT

    B, H, W = smooth.shape
    Hb = _round_up(H, _BAND)
    Wo = _round_up(W, _LANE)
    Wi = _round_up(Wo + 2 * _R, _LANE)
    Hi = _round_up(Hb + 2 * _R, 8)

    padded = jnp.zeros((B, Hi, Wi), smooth.dtype)
    padded = jax.lax.dynamic_update_slice(padded, smooth, (0, _R, _R))

    n_bands = Hb // _BAND
    kernel = _make_batch_kernel(np.asarray(_PAT), _BAND, Wo)
    planes = pl.pallas_call(
        kernel,
        grid=(B, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, Hi, Wi), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 8, _BAND, Wo),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, Hb, Wo), jnp.uint32),
        interpret=interpret,
    )(padded)
    return planes[:, :, :H, :W]
