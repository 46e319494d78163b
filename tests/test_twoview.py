"""Two-view reconstruction tests on synthetic geometry with known motion."""

import numpy as np
import jax
import jax.numpy as jnp

from monoorbslam3_tpu.ops.twoview import reconstruct_two_views, triangulate_dlt
from monoorbslam3_tpu.utils import lie

RNG = np.random.default_rng(11)
K = np.array([[450.0, 0.0, 376.0], [0.0, 450.0, 240.0], [0.0, 0.0, 1.0]], np.float32)


def _project(K, pts):
    uv = pts @ K.T
    return uv[:, :2] / uv[:, 2:3]


def _make_pair(points_w, R21, t21, noise=0.3, n_outliers=20, n_pad=64):
    """points in frame 1; camera 2 at (R21, t21)."""
    uv1 = _project(K, points_w)
    pc2 = points_w @ R21.T + t21
    uv2 = _project(K, pc2)
    n = len(points_w)
    uv1 = uv1 + RNG.normal(scale=noise, size=uv1.shape)
    uv2 = uv2 + RNG.normal(scale=noise, size=uv2.shape)
    if n_outliers:
        sel = RNG.choice(n, n_outliers, replace=False)
        uv2[sel] += RNG.uniform(30, 120, size=(n_outliers, 2)) * RNG.choice([-1, 1], (n_outliers, 2))
    pad = np.zeros((n_pad, 2))
    xy1 = np.concatenate([uv1, pad]).astype(np.float32)
    xy2 = np.concatenate([uv2, pad]).astype(np.float32)
    valid = np.concatenate([np.ones(n, bool), np.zeros(n_pad, bool)])
    return jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(valid)


def test_general_motion_fundamental_path():
    pts = np.stack(
        [RNG.uniform(-3, 3, 400), RNG.uniform(-2, 2, 400), RNG.uniform(4, 12, 400)], axis=-1
    )
    R21 = np.asarray(lie.exp_so3(jnp.asarray([0.02, -0.1, 0.03], jnp.float32)))
    t21 = np.array([0.4, 0.05, 0.02], np.float32)
    xy1, xy2, valid = _make_pair(pts, R21, t21)

    out = reconstruct_two_views(xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(0))
    assert bool(out["success"]), f"failed: n_good={out['n_good']}, rh={out['rh']}"
    assert float(out["rh"]) < 0.6  # non-planar: fundamental family should win
    R_est = np.asarray(out["R"])
    t_est = np.asarray(out["t"])
    # rotation error
    dR = R_est.T @ R21
    ang = np.degrees(np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray(dR, jnp.float32)))))
    assert ang < 1.0, f"rotation error {ang} deg"
    # translation direction error (scale-free)
    cos = abs(t_est @ t21 / (np.linalg.norm(t_est) * np.linalg.norm(t21)))
    assert cos > 0.995, f"translation direction cos {cos}"
    # triangulated points match ground truth up to the mono scale
    good = np.asarray(out["good"])
    X = np.asarray(out["points"])[good]
    gt = pts[np.nonzero(good[: len(pts)])[0]]
    scale = np.median(np.linalg.norm(X, axis=1) / np.linalg.norm(gt, axis=1))
    err = np.linalg.norm(X / scale - gt, axis=1)
    # depth sigma ~ noise * z^2 / (f b) ~ 0.24 m at z=12: check the bulk, not the tail
    assert np.median(err) < 0.3, f"median point error {np.median(err)}"
    assert np.quantile(err, 0.9) < 1.0, f"p90 point error {np.quantile(err, 0.9)}"
    assert good.sum() > 250


def test_planar_scene_homography_path():
    # points on the z=6 plane with small jitter-free planarity
    pts = np.stack(
        [RNG.uniform(-4, 4, 400), RNG.uniform(-2.5, 2.5, 400), np.full(400, 6.0)], axis=-1
    )
    R21 = np.asarray(lie.exp_so3(jnp.asarray([0.03, 0.08, -0.02], jnp.float32)))
    t21 = np.array([0.35, -0.1, 0.05], np.float32)
    xy1, xy2, valid = _make_pair(pts, R21, t21, n_outliers=10)

    out = reconstruct_two_views(xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(1))
    assert bool(out["success"]), f"failed: n_good={out['n_good']}, rh={out['rh']}"
    assert float(out["rh"]) > 0.45  # planar: homography family wins
    R_est = np.asarray(out["R"])
    dR = R_est.T @ R21
    ang = np.degrees(np.linalg.norm(np.asarray(lie.log_so3(jnp.asarray(dR, jnp.float32)))))
    assert ang < 1.5, f"rotation error {ang} deg"
    cos = abs(np.asarray(out["t"]) @ t21 / np.linalg.norm(t21))
    assert cos > 0.99


def test_pure_rotation_rejected():
    pts = np.stack(
        [RNG.uniform(-3, 3, 300), RNG.uniform(-2, 2, 300), RNG.uniform(4, 12, 300)], axis=-1
    )
    R21 = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.05, 0.0], jnp.float32)))
    t21 = np.zeros(3, np.float32)
    xy1, xy2, valid = _make_pair(pts, R21, t21, noise=0.3, n_outliers=0)
    out = reconstruct_two_views(xy1, xy2, valid, jnp.asarray(K), jax.random.PRNGKey(2))
    assert not bool(out["success"])  # no parallax -> must not initialize


def test_triangulate_dlt_exact():
    pts = np.stack(
        [RNG.uniform(-2, 2, 50), RNG.uniform(-2, 2, 50), RNG.uniform(3, 9, 50)], axis=-1
    ).astype(np.float32)
    R = np.asarray(lie.exp_so3(jnp.asarray([0.05, -0.03, 0.01], jnp.float32)))
    t = np.array([0.5, 0.0, 0.0], np.float32)
    P1 = np.concatenate([K, np.zeros((3, 1), np.float32)], axis=1)
    P2 = K @ np.concatenate([R, t[:, None]], axis=1)
    uv1 = _project(K, pts)
    uv2 = _project(K, pts @ R.T + t)
    X = np.asarray(triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                                   jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32)))
    np.testing.assert_allclose(X, pts, atol=5e-2)
