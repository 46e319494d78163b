"""Golden tests for the SO(3)/SE(3) toolbox vs closed forms (float64 numpy)."""

import numpy as np
import jax.numpy as jnp
import scipy.linalg

from monoorbslam3_tpu.utils import lie
from monoorbslam3_tpu.utils.se3 import Pose

RNG = np.random.default_rng(0)


def _np_exp(w):
    return scipy.linalg.expm(np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]))


def test_exp_log_roundtrip():
    ws = RNG.normal(size=(64, 3)).astype(np.float32)
    ws[0] = 0.0
    ws[1] = [1e-8, 0, 0]
    R = lie.exp_so3(jnp.asarray(ws))
    w_back = lie.log_so3(R)
    np.testing.assert_allclose(np.asarray(w_back), ws, atol=2e-5)


def test_exp_matches_expm():
    for w in [np.zeros(3), np.array([0.1, -0.2, 0.3]), np.array([2.0, 1.5, -1.0])]:
        R = np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))
        np.testing.assert_allclose(R, _np_exp(w), atol=1e-5)


def test_log_near_pi():
    w = np.array([np.pi - 1e-4, 0.0, 0.0])
    R = _np_exp(w).astype(np.float32)
    w_back = np.asarray(lie.log_so3(jnp.asarray(R)))
    np.testing.assert_allclose(w_back, w, atol=1e-3)


def test_right_jacobian_finite_diff():
    w = np.array([0.3, -0.1, 0.2], np.float64)
    Jr = np.asarray(lie.right_jacobian_so3(jnp.asarray(w, jnp.float32)))
    # exp(w + Jr dw) ≈ exp(w) exp(dw') with dw' = Jr dw: finite-difference check
    eps = 1e-4
    for i in range(3):
        dw = np.zeros(3)
        dw[i] = eps
        R1 = _np_exp(w + dw)
        R0 = _np_exp(w)
        dtheta = np.asarray(lie.log_so3(jnp.asarray((R0.T @ R1).astype(np.float32))))
        np.testing.assert_allclose(dtheta / eps, Jr[:, i], atol=1e-2)


def test_inv_right_jacobian():
    ws = RNG.normal(size=(16, 3)).astype(np.float32) * 0.5
    Jr = np.asarray(lie.right_jacobian_so3(jnp.asarray(ws)))
    Jri = np.asarray(lie.inv_right_jacobian_so3(jnp.asarray(ws)))
    prod = Jr @ Jri
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)


def test_normalize_rotation():
    R = np.asarray(lie.exp_so3(jnp.asarray(RNG.normal(size=3), jnp.float32)))
    R_noisy = R + RNG.normal(size=(3, 3)).astype(np.float32) * 1e-3
    Rn = np.asarray(lie.normalize_rotation(jnp.asarray(R_noisy)))
    np.testing.assert_allclose(Rn @ Rn.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(Rn) > 0.999
    np.testing.assert_allclose(Rn, R, atol=5e-3)


def test_quat_roundtrip():
    ws = RNG.normal(size=(32, 3)).astype(np.float32)
    R = lie.exp_so3(jnp.asarray(ws))
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_pose_compose_inverse():
    Ra = lie.exp_so3(jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32))
    ta = jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32)
    pose = Pose(Ra, ta)
    ident = pose.compose(pose.inverse())
    np.testing.assert_allclose(np.asarray(ident.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.t), np.zeros((8, 3)), atol=1e-5)

    p = jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32)
    back = pose.inverse().apply(pose.apply(p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-5)


def test_retract_kf_reprojects_to_so3():
    """retract_kf must pin off-manifold drift: starting from a rotation with
    a symmetric error (the kind the motion-model chain doubles per frame —
    the round-1 ~1 s tracking collapse), one retraction step must return to
    SO(3) at roughly the square of the input error."""
    import numpy as np
    from monoorbslam3_tpu.backend import residuals as res

    rng = np.random.default_rng(0)
    w = rng.normal(size=3) * 0.3
    R = np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))
    E = rng.normal(size=(3, 3)).astype(np.float32)
    E = 1e-3 * (E + E.T) / 2.0
    R_bad = R @ (np.eye(3, dtype=np.float32) + E)
    err_in = np.linalg.norm(R_bad.T @ R_bad - np.eye(3))
    s = res.KfState(jnp.asarray(R_bad), jnp.zeros(3), jnp.zeros(3),
                    jnp.zeros(3), jnp.zeros(3))
    s2 = res.retract_kf(s, jnp.zeros(15, jnp.float32))
    R2 = np.asarray(s2.R_wb)
    err_out = np.linalg.norm(R2.T @ R2 - np.eye(3))
    assert err_in > 1e-3  # the perturbation is real
    assert err_out < 5.0 * err_in**2 + 1e-6, (err_in, err_out)
