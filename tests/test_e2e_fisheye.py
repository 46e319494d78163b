"""End-to-end pipeline on a KB4 fisheye camera (feature injection).

The reference supports TUM-VI's equidistant fisheye (Fisheye.cpp): its
keypoints stay DISTORTED with per-pixel uncertainty, so every geometric
stage — two-view bootstrap (undistort-for-init), tracking reprojection,
triangulation, fuse — must run through the full camera model rather than
an ideal K. This drives the same synthetic circle world as
test_e2e_synthetic through a Fisheye camera end to end.
"""

import numpy as np
import jax.numpy as jnp

from monoorbslam3_tpu.models.camera import Fisheye
from monoorbslam3_tpu.sim import Trajectory, World
from monoorbslam3_tpu.system import System
from monoorbslam3_tpu.frontend import tracking as T
from monoorbslam3_tpu.evaluation.ate import umeyama_align

from tests.test_e2e_synthetic import (
    BA_TRUE, BG_TRUE, CALIB, N_FEAT, R_BC, T_BC, _make_feats,
)

# TUM-VI-like KB4 camera
CAM_FE = Fisheye.create(
    fx=380.8, fy=380.3, cx=254.9, cy=256.9, width=512, height=512,
    dist=(0.0103, -0.0177, 0.0059, -0.0009),
)


def test_fisheye_projection_roundtrip():
    rng = np.random.default_rng(0)
    pc = np.stack([rng.uniform(-2, 2, 64), rng.uniform(-2, 2, 64),
                   rng.uniform(1, 8, 64)], -1).astype(np.float32)
    uv = CAM_FE.project(jnp.asarray(pc))
    rays = np.asarray(CAM_FE.back_project(uv))
    want = pc / pc[:, 2:]
    np.testing.assert_allclose(rays, want, atol=2e-3)


def test_fisheye_pipeline_tracks_and_is_accurate():
    traj = Trajectory()
    world = World(traj=traj, n_points=3000, seed=5)
    rng0 = np.random.default_rng(7)
    r = rng0.uniform(traj.radius + 1.0, traj.radius + 4.0, 3000)
    th = rng0.uniform(0, 2 * np.pi, 3000)
    z = rng0.uniform(-2.0, 3.0, 3000)
    world.points = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
    rng = np.random.default_rng(9)

    syst = System(CAM_FE, CALIB, config={
        "n_features": N_FEAT, "init_min_features": 100,
        "init_min_matches": 60, "local_k": 16, "local_p": 1024,
        "local_o": 3072, "local_pt_cap": 1024, "imu_init_kfs": 10,
        "max_pt": 16384, "kf_max_interval": 0.25,
        "kf_tracked_ratio": 0.85})
    last_t = 0.0
    states = []
    for i, t in enumerate(np.arange(0.0, 5.0, 1 / 20.0)):
        obs = world.observe(t, CAM_FE, R_BC, T_BC, noise_px=0.3,
                            flip_bits=4, max_kps=N_FEAT, rng=rng)
        imu = None
        if i:
            g_, a_, d_ = traj.imu_samples(last_t, t, 200.0, bg=BG_TRUE,
                                          ba=BA_TRUE, noise_gyro=1.7e-4,
                                          noise_acc=2e-3, rng=rng)
            ts = last_t + np.cumsum(d_)
            imu = np.concatenate([ts[:, None], g_, a_], axis=1)
        states.append(syst.track_features(t, _make_feats(obs), imu))
        last_t = t
    states = np.asarray(states)

    ok = states == T.OK
    assert ok.any(), "fisheye pipeline never initialized"
    first_ok = np.nonzero(ok)[0][0]
    assert first_ok < 30, f"slow fisheye bootstrap (frame {first_ok})"
    assert (states == T.LOST).sum() == 0, "tracking deaths on fisheye"
    assert ok[first_ok:].mean() > 0.85, f"OK ratio {ok[first_ok:].mean():.2f}"
    assert syst.mapper.imu_state >= 1, "IMU never initialized (fisheye)"

    ids = syst.store.keyframe_ids()
    assert len(ids) >= 5
    kt = np.array([syst.store.kf_time[k] for k in ids])
    kp = np.stack([syst.store.kf_t[k] for k in ids])
    gt = traj.pos(kt)
    s, R, tt = umeyama_align(kp, gt)
    err = np.linalg.norm((s * kp @ R.T + tt) - gt, axis=1)
    rmse = float(np.sqrt((err**2).mean()))
    assert rmse < 0.15, f"fisheye KF ATE RMSE {rmse * 100:.0f} cm"
