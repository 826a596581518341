"""Native runtime library tests: PNG/PGM decode vs cv2 oracle, threaded
prefetcher ordering, union-find vs the Python implementation."""

import os

import numpy as np
import cv2
import pytest

from vslam_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

RNG = np.random.default_rng(29)


def test_decode_png_gray8(tmp_path):
    img = RNG.integers(0, 256, (240, 320), dtype=np.uint8)
    p = str(tmp_path / "g8.png")
    cv2.imwrite(p, img)
    out = native.decode_image(p)
    assert out is not None and out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_decode_png_gray16(tmp_path):
    img = RNG.integers(0, 65536, (120, 160), dtype=np.uint16)
    p = str(tmp_path / "g16.png")
    cv2.imwrite(p, img)
    out = native.decode_image(p)
    assert out is not None and out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_decode_png_rgb_to_gray(tmp_path):
    img = RNG.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    cv2.imwrite(p, img)
    out = native.decode_image(p)
    oracle = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    assert out is not None
    # Rounding conventions differ by at most 1 LSB.
    assert np.abs(out.astype(int) - oracle.astype(int)).max() <= 1


def test_decode_pgm(tmp_path):
    img = RNG.integers(0, 256, (100, 150), dtype=np.uint8)
    p = str(tmp_path / "img.pgm")
    cv2.imwrite(p, img)
    out = native.decode_image(p)
    np.testing.assert_array_equal(out, img)


def test_decode_missing_file():
    assert native.decode_image("/nonexistent/file.png") is None


def test_prefetcher_in_order(tmp_path):
    paths = []
    imgs = []
    for i in range(20):
        img = np.full((50, 60), i * 10, np.uint8)
        img[0, 0] = i  # unique marker
        p = str(tmp_path / f"{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        imgs.append(img)
    pf = native.Prefetcher(paths, n_threads=3, look_ahead=4)
    got = list(pf)
    pf.close()
    assert len(got) == 20
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, imgs[i])


def test_union_find_matches_python():
    pairs = np.array(
        [[5, 9], [9, 12], [3, 4], [7, 7], [-1, 2], [12, 20]], np.int32
    )
    remap = native.union_find(pairs)
    # {5,9,12,20} -> 5 ; {3,4} -> 3
    assert remap == {9: 5, 12: 5, 20: 5, 4: 3}


def test_union_find_large_random():
    n = 2000
    pairs = RNG.integers(0, 500, (n, 2)).astype(np.int32)
    remap = native.union_find(pairs)
    # Python oracle
    from vslam_tpu.mapping.merging import UnionFind

    uf = UnionFind()
    for a, b in pairs:
        if a != b:
            uf.union(int(a), int(b))
    oracle = {x: uf.find(x) for x in list(uf.parent) if uf.find(x) != x}
    assert remap == oracle
