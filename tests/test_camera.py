"""Camera model tests: projection/backprojection/undistortion consistency."""

import numpy as np
import jax.numpy as jnp

from monoorbslam3_tpu.models.camera import Pinhole, Fisheye

RNG = np.random.default_rng(1)

# EuRoC-like pinhole (settings analog of reference settings/euroc.yaml)
PIN = Pinhole.create(
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    dist=[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0],
    width=752, height=480,
)

# TUM-VI-like fisheye
FISH = Fisheye.create(
    fx=190.97847, fy=190.9733, cx=254.93170, cy=256.89742,
    dist=[0.0034823894, 0.0007150348, -0.0020532361, 0.00020293673],
    width=512, height=512,
)


def test_pinhole_project_backproject():
    pc = RNG.uniform(-1, 1, size=(128, 3)).astype(np.float32)
    pc[:, 2] = RNG.uniform(0.5, 5.0, size=128)
    uv = PIN.project(jnp.asarray(pc))
    rays = PIN.back_project(uv)
    scaled = np.asarray(rays) * pc[:, 2:3]
    np.testing.assert_allclose(scaled, pc, rtol=1e-4, atol=1e-3)


def test_pinhole_undistort_roundtrip():
    # distort ideal points forward, then undo with the iterative inverse
    xy = RNG.uniform(-0.4, 0.4, size=(256, 2)).astype(np.float32)
    xyd = PIN.distort_normalized(jnp.asarray(xy))
    uv_raw = jnp.stack([xyd[:, 0] * PIN.fx + PIN.cx, xyd[:, 1] * PIN.fy + PIN.cy], axis=-1)
    uv_ideal = PIN.undistort_points(uv_raw)
    expect_u = xy[:, 0] * np.float32(PIN.fx) + np.float32(PIN.cx)
    expect_v = xy[:, 1] * np.float32(PIN.fy) + np.float32(PIN.cy)
    np.testing.assert_allclose(np.asarray(uv_ideal)[:, 0], expect_u, atol=0.05)
    np.testing.assert_allclose(np.asarray(uv_ideal)[:, 1], expect_v, atol=0.05)


def test_pinhole_jacobian_matches_finite_diff():
    pc = np.array([[0.3, -0.2, 2.0]], np.float32)
    J = np.asarray(PIN.proj_jacobian(jnp.asarray(pc)))[0]
    eps = 1e-3
    for i in range(3):
        d = np.zeros((1, 3), np.float32)
        d[0, i] = eps
        df = (np.asarray(PIN.project(jnp.asarray(pc + d))) - np.asarray(PIN.project(jnp.asarray(pc)))) / eps
        np.testing.assert_allclose(df[0], J[:, i], rtol=2e-2, atol=2e-2)


def test_fisheye_project_backproject():
    pc = RNG.uniform(-1, 1, size=(128, 3)).astype(np.float32)
    pc[:, 2] = RNG.uniform(0.5, 5.0, size=128)
    uv = FISH.project(jnp.asarray(pc))
    rays = np.asarray(FISH.back_project(uv))
    dirs = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    ray_dirs = rays / np.linalg.norm(rays, axis=1, keepdims=True)
    np.testing.assert_allclose(ray_dirs, dirs, atol=1e-3)


def test_fisheye_uncertainty_ge_one_off_center():
    uv = jnp.asarray([[254.93, 256.89], [40.0, 40.0]], jnp.float32)
    unc = np.asarray(FISH.uncertainty(uv))
    assert abs(unc[0] - 1.0) < 0.05  # center: distortion negligible
    assert unc[1] > 1.0  # periphery: ideal displacement > distorted displacement
