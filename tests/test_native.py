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


TSAN_SO = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "build", "libvslam_native_tsan.so",
)
_TSAN_RT = "/usr/lib/x86_64-linux-gnu/libtsan.so.2"


@pytest.mark.slow
@pytest.mark.skipif(
    not (os.path.exists(TSAN_SO) and os.path.exists(_TSAN_RT)),
    reason="TSAN build not present (make -C native tsan)",
)
def test_prefetcher_tsan_clean(tmp_path):
    """The threaded prefetcher under ThreadSanitizer: create/consume/
    destroy cycles with more worker threads than queue slots must report
    zero races (SURVEY §5 — the reference has no sanitizer coverage at
    all; our native runtime runs real threads, so this is the TSAN-in-CI
    item).  Runs in a subprocess with the TSAN runtime preloaded; pure
    ctypes so no numpy/BLAS thread noise enters the report."""
    import subprocess
    import sys as _sys

    # Small PGM fixtures for the workers to decode.
    paths = []
    for i in range(12):
        p = tmp_path / f"f{i}.pgm"
        payload = bytes((i * 7 + j) % 251 for j in range(64 * 48))
        p.write_bytes(b"P5\n64 48\n255\n" + payload)
        paths.append(str(p))

    script = f"""
import ctypes
lib = ctypes.CDLL({TSAN_SO!r})
u8p = ctypes.POINTER(ctypes.c_uint8)
i32p = ctypes.POINTER(ctypes.c_int32)
lib.vn_prefetcher_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int]
lib.vn_prefetcher_create.restype = ctypes.c_void_p
lib.vn_prefetcher_next.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64, i32p, i32p, i32p]
lib.vn_prefetcher_next.restype = ctypes.c_int
lib.vn_prefetcher_destroy.argtypes = [ctypes.c_void_p]
paths = {paths!r}
enc = [p.encode() for p in paths]
buf = (ctypes.c_uint8 * (64 * 48 * 2))()
h = ctypes.c_int32(); w = ctypes.c_int32(); bpp = ctypes.c_int32()
for cycle in range(4):
    arr = (ctypes.c_char_p * len(enc))(*enc)
    hd = lib.vn_prefetcher_create(arr, len(enc), 5, 3)
    # consume a PREFIX only on odd cycles: destroy must join workers
    # mid-flight without racing the queue.
    n = len(enc) if cycle % 2 == 0 else len(enc) // 2
    for k in range(n):
        rc = lib.vn_prefetcher_next(hd, buf, len(buf), ctypes.byref(h), ctypes.byref(w), ctypes.byref(bpp))
        assert rc == 0, rc
        assert (h.value, w.value) == (48, 64)
    lib.vn_prefetcher_destroy(hd)
print("TSAN_STRESS_OK")
"""
    env = dict(os.environ)
    env["LD_PRELOAD"] = _TSAN_RT
    env["TSAN_OPTIONS"] = "exitcode=66 halt_on_error=0"
    res = subprocess.run(
        [_sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, env=env,
    )
    out = res.stdout + res.stderr
    assert "TSAN_STRESS_OK" in out, out[-3000:]
    assert "WARNING: ThreadSanitizer" not in out, out[-5000:]
    assert res.returncode == 0, (res.returncode, out[-3000:])
