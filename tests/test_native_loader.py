"""Native dataset loader (PNG/PNM decode, IMU parse, prefetcher) vs PIL /
the Python parsers."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from monoorbslam3_tpu import native

RNG = np.random.default_rng(11)

ext = native.get_ext("dataloader")
pytestmark = pytest.mark.skipif(ext is None,
                                reason="native dataloader did not build")


def _save(tmp_path, name, img: Image.Image, **kw):
    p = os.path.join(tmp_path, name)
    img.save(p, **kw)
    return p


@pytest.mark.parametrize("mode,size", [
    ("L", (64, 48)),
    ("L", (753, 31)),      # odd width exercises filter bpp offsets
    ("RGB", (40, 40)),
    ("RGBA", (33, 17)),
    ("LA", (20, 20)),
    ("P", (48, 32)),
    ("1", (64, 24)),       # 1-bit gray
])
def test_png_decode_matches_pil(tmp_path, mode, size):
    w, h = size
    base = RNG.integers(0, 256, (h, w, 4), dtype=np.uint8)
    # smooth regions make PIL pick varied scanline filters
    base[: h // 2] = base[: h // 2] // 4 + 100
    img = Image.fromarray(base, "RGBA").convert(mode)
    path = _save(tmp_path, f"img_{mode.replace(';', '_')}.png", img)

    got = native.load_gray(path)
    assert got is not None and got.shape == (h, w)
    ref = np.asarray(img.convert("L"), np.float32)
    # PIL's L conversion truncates its integer luma; ours is float
    assert np.abs(got - ref).max() <= 1.0 + 1e-5


def test_png_16bit(tmp_path):
    arr = RNG.integers(0, 65536, (25, 37), dtype=np.uint16)
    img = Image.fromarray(arr, "I;16")
    path = _save(tmp_path, "img16.png", img)
    got = native.load_gray(path)
    assert got is not None
    np.testing.assert_allclose(got, (arr >> 8).astype(np.float32))


def test_pgm_ppm(tmp_path):
    arr = RNG.integers(0, 256, (21, 33), dtype=np.uint8)
    p5 = _save(tmp_path, "img.pgm", Image.fromarray(arr, "L"))
    got = native.load_gray(p5)
    np.testing.assert_allclose(got, arr.astype(np.float32))

    rgb = RNG.integers(0, 256, (14, 19, 3), dtype=np.uint8)
    p6 = _save(tmp_path, "img.ppm", Image.fromarray(rgb, "RGB"))
    got = native.load_gray(p6)
    ref = np.asarray(Image.fromarray(rgb, "RGB").convert("L"), np.float32)
    assert np.abs(got - ref).max() <= 1.0 + 1e-5


def test_decode_failures_return_none(tmp_path):
    bad = os.path.join(tmp_path, "bad.png")
    with open(bad, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really a png at all")
    assert native.load_gray(bad) is None
    assert native.load_gray(os.path.join(tmp_path, "missing.png")) is None


def test_prefetcher_in_order_with_fallback(tmp_path):
    paths, refs = [], []
    for i in range(12):
        arr = np.full((8, 16), i * 20, np.uint8)
        paths.append(_save(tmp_path, f"f{i:03d}.png", Image.fromarray(arr, "L")))
        refs.append(arr.astype(np.float32))
    # frame 5 is an Adam7-interlaced PNG: native decode fails, PIL fallback
    arr5 = np.arange(128, dtype=np.uint8).reshape(8, 16)
    interlaced = io.BytesIO()
    Image.fromarray(arr5, "L").save(interlaced, "PNG", interlace=True)
    with open(paths[5], "wb") as f:
        f.write(interlaced.getvalue())
    refs[5] = arr5.astype(np.float32)

    def fallback(p):
        return np.asarray(Image.open(p).convert("L"), np.float32)

    out = list(native.ImagePrefetcher(paths, fallback, workers=3, depth=4))
    assert len(out) == 12
    for got, ref in zip(out, refs):
        np.testing.assert_allclose(got, ref)


def test_parse_imu_matches_python(tmp_path):
    path = os.path.join(tmp_path, "imu.txt")
    with open(path, "w") as f:
        f.write("0.0 1 2 3 4 5 6\n")
        f.write("# comment line\n")
        f.write("0.005 .1 -2e-3 3.5 4 5 6\n")
        f.write("0.004 9 9 9 9 9 9\n")          # decreasing t: dropped
        f.write("0.005 9 9 9 9 9 9\n")          # equal t: dropped
        f.write("0.010 1 2 3 4 5\n")            # short line: dropped
        f.write("0.015 1 2 3 4 5 6 7 8\n")      # extra cols: first 7 kept
        f.write("\n")
    got = native.parse_imu(path)
    assert got is not None

    import importlib
    os.environ["MONOSLAM_NO_NATIVE"] = "1"
    try:
        saved = dict(native._exts)
        native._exts.clear()
        from monoorbslam3_tpu.runners import datasets
        ref = datasets.load_imu(path)
    finally:
        del os.environ["MONOSLAM_NO_NATIVE"]
        native._exts.clear()
        native._exts.update(saved)
    np.testing.assert_allclose(got, ref)
    assert got.shape == (3, 7)
