"""ORB frontend tests: FAST detection, extractor, and Hamming matching.

Analog of the reference's extractor_test / initialize_search_test
(test/ORB/extractorTest.cpp, initializeSearchTest.cpp) made deterministic:
synthetic textures with known geometry instead of dataset folders.
"""

import numpy as np
import jax.numpy as jnp

from monoorbslam3_tpu.ops import fast as fast_ops
from monoorbslam3_tpu.ops import matching
from monoorbslam3_tpu.ops.orb import OrbExtractor

RNG = np.random.default_rng(3)
H, W = 240, 320


def _textured_image(rng=None, h=H, w=W):
    """Blocky random texture with strong corners everywhere."""
    rng = rng or RNG
    small = rng.uniform(0, 255, size=(h // 8, w // 8))
    img = np.kron(small, np.ones((8, 8)))
    return img.astype(np.float32)


def test_fast_detects_rectangle_corners():
    img = np.zeros((128, 128), np.float32)
    img[40:80, 30:90] = 200.0
    score = np.asarray(fast_ops.fast_score_map(jnp.asarray(img), 20.0))
    nms = np.asarray(fast_ops.nms3(jnp.asarray(score)))
    ys, xs = np.nonzero(nms)
    assert len(ys) >= 4
    corners = np.array([[40, 30], [40, 89], [79, 30], [79, 89]])
    for cy, cx in corners:
        d = np.min(np.abs(ys - cy) + np.abs(xs - cx))
        assert d <= 3, f"corner ({cy},{cx}) missed (nearest {d})"
    # no detections well inside the uniform region
    inside = (ys > 50) & (ys < 70) & (xs > 40) & (xs < 80)
    assert inside.sum() == 0


def test_extractor_shapes_and_determinism():
    ext = OrbExtractor(H, W, n_features=256, cell=16, per_cell=4)
    img = _textured_image()
    f1 = ext(img)
    f2 = ext(img)
    assert f1["xy"].shape == (256, 2)
    assert f1["desc"].shape == (256, 8) and f1["desc"].dtype == jnp.uint32
    np.testing.assert_array_equal(np.asarray(f1["desc"]), np.asarray(f2["desc"]))
    valid = np.asarray(f1["valid"])
    assert valid.sum() > 100
    xy = np.asarray(f1["xy"])[valid]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < W).all()
    assert (xy[:, 1] >= 0).all() and (xy[:, 1] < H).all()
    # spatial spread: keypoints should cover at least half the image quadrants
    qx = (xy[:, 0] > W / 2).astype(int) * 2 + (xy[:, 1] > H / 2).astype(int)
    assert len(np.unique(qx)) == 4


def test_hamming_matrix_vs_numpy():
    a = RNG.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
    b = RNG.integers(0, 2**32, size=(24, 8), dtype=np.uint32)
    d = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    expect = np.zeros((16, 24), np.int32)
    for i in range(16):
        for j in range(24):
            expect[i, j] = bin(int(a[i, 0]) ^ int(b[j, 0])).count("1") + sum(
                bin(int(a[i, k]) ^ int(b[j, k])).count("1") for k in range(1, 8)
            )
    np.testing.assert_array_equal(d, expect)


def test_match_shifted_image():
    """Extract on an image and a translated copy; matches must recover the
    translation (the deterministic analog of initialize_search_test)."""
    ext = OrbExtractor(H, W, n_features=256)
    img = _textured_image()
    dx, dy = 7, -5
    img2 = np.roll(img, (dy, dx), axis=(0, 1))

    fa = ext(img)
    fb = ext(img2)
    shifted_xy = fa["xy"] + jnp.asarray([dx, dy], jnp.float32)
    mask = matching.window_mask(shifted_xy, fb["xy"], fa["valid"], fb["valid"], radius=12.0)
    idx, dist = matching.match_descriptors(
        fa["desc"], fb["desc"], mask,
        angles_a=fa["angle"], angles_b=fb["angle"],
        max_dist=matching.TH_LOW, ratio=0.9, use_rotation=True,
    )
    idx = np.asarray(idx)
    matched = idx >= 0
    assert matched.sum() > 50, f"only {matched.sum()} matches"
    da = np.asarray(fb["xy"])[idx[matched]] - np.asarray(fa["xy"])[matched]
    med = np.median(da, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=1.5)
    inlier = (np.abs(da - [dx, dy]) < 2.0).all(axis=1).mean()
    assert inlier > 0.8, f"inlier ratio {inlier}"


def test_masked_nn_match_respects_mask_and_ratio():
    a = RNG.integers(0, 2**32, size=(4, 8), dtype=np.uint32)
    b = np.concatenate([a, a[:1]], axis=0)  # b[4] duplicates a[0]
    d = matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b))
    full = jnp.ones((4, 5), bool)
    idx, _ = matching.masked_nn_match(d, full, max_dist=10, ratio=0.9, mutual=False)
    idx = np.asarray(idx)
    # a[0] has two perfect candidates (b[0], b[4]) -> ratio test kills it
    assert idx[0] == -1
    assert idx[1] == 1 and idx[2] == 2 and idx[3] == 3
    # masking out the duplicate restores the match
    m = np.ones((4, 5), bool)
    m[:, 4] = False
    idx2, _ = matching.masked_nn_match(d, jnp.asarray(m), max_dist=10, ratio=0.9, mutual=False)
    assert np.asarray(idx2)[0] == 0


def test_subpixel_peak_offsets_recover_parabola_peak():
    """On an analytic quadratic peak the refinement must recover the
    sub-pixel maximum; invalid slots must get zero offset."""
    h, w = 32, 32
    cy, cx = 15.7, 16.3  # true peak
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    score = 100.0 - (ys - cy) ** 2 - (xs - cx) ** 2
    iy, ix = 16, 16  # integer argmax
    offx, offy = fast_ops.subpixel_peak_offsets(
        jnp.asarray(score),
        jnp.asarray([iy, 0], np.int32), jnp.asarray([ix, 0], np.int32),
        jnp.asarray([True, False]))
    np.testing.assert_allclose(float(offx[0]), cx - ix, atol=1e-3)
    np.testing.assert_allclose(float(offy[0]), cy - iy, atol=1e-3)
    assert float(offx[1]) == 0.0 and float(offy[1]) == 0.0


def test_extractor_subpixel_flag():
    """subpixel=True must only move keypoints by < 0.5 px at their level's
    scale and must not change descriptors/validity."""
    img = _textured_image()
    e0 = OrbExtractor(H, W, n_features=128, subpixel=False)
    e1 = OrbExtractor(H, W, n_features=128, subpixel=True)
    f0, f1 = e0(img), e1(img)
    np.testing.assert_array_equal(np.asarray(f0["desc"]), np.asarray(f1["desc"]))
    np.testing.assert_array_equal(np.asarray(f0["valid"]), np.asarray(f1["valid"]))
    v = np.asarray(f0["valid"])
    sf = e0.scale_factors[np.asarray(f0["level"])[v]]
    d = np.abs(np.asarray(f1["xy"])[v] - np.asarray(f0["xy"])[v])
    assert (d <= 0.5 * sf[:, None] + 1e-5).all()
    assert (d > 0).any(), "refinement moved nothing"


def test_descriptor_rotation_invariance():
    """Rotated BRIEF (IC-angle steering) must match descriptors across an
    in-plane rotation — the property that separates rBRIEF from plain
    BRIEF (ORBExtractor.cpp:18-48 orientation + steered pattern). Rotate a
    textured image 30 deg, extract both, match with no spatial gate, and
    check the matches obey the known rotation."""
    from PIL import Image

    from monoorbslam3_tpu.ops.orb import OrbExtractor
    from monoorbslam3_tpu.ops import matching

    rng = np.random.default_rng(4)
    H = W = 384
    # smooth random texture: corners at many orientations
    small = rng.uniform(0, 255, (H // 8, W // 8))
    img = np.kron(small, np.ones((8, 8))).astype(np.float32)

    deg = 30.0
    rot = np.asarray(Image.fromarray(img.astype(np.uint8)).rotate(
        deg, resample=Image.BILINEAR), np.float32)

    ext = OrbExtractor(H, W, n_features=512)
    a = ext(jnp.asarray(img))
    b = ext(jnp.asarray(rot))

    idx, _ = matching.match_descriptors(
        jnp.asarray(a["desc"]), jnp.asarray(b["desc"]),
        jnp.asarray(a["valid"])[:, None] & jnp.asarray(b["valid"])[None, :],
        max_dist=matching.TH_LOW, ratio=0.8)
    idx = np.asarray(idx)
    hit = idx >= 0
    n_matches = int(hit.sum())
    assert n_matches > 40, f"only {n_matches} cross-rotation matches"

    # PIL rotates CCW about the center; predicted position of a in b
    th = np.deg2rad(deg)
    c = np.array([(W - 1) / 2.0, (H - 1) / 2.0])
    R2 = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    xa = np.asarray(a["xy"])[hit]
    xb = np.asarray(b["xy"])[idx[hit]]
    pred = (xa - c) @ R2.T + c
    err = np.linalg.norm(pred - xb, axis=1)
    frac_good = float((err < 4.0).mean())
    assert frac_good > 0.6, (
        f"only {frac_good:.0%} of {n_matches} matches obey the rotation")
