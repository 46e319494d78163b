"""End-to-end test of the dataset-runner CLI over an on-disk dataset.

Renders sim.ImageWorld frames into an EuRoC-layout folder (cam0/times.txt,
cam0/data/%08d.png, imu.txt — the layout of test/eurocDemo.cpp:14-40),
then drives the REAL user entry point — `runners.datasets.main` — so the
full chain runs exactly as a user would run it: settings yaml ->
config.build_system -> native C++ PNG decode + prefetch -> System.track
-> shutdown exports; finally the exported TUM trajectory is scored
against the simulator ground truth with the evaluation stack (the
compare.py analog). This is the deterministic stand-in for the
reference's dataset demos + evaluation/result.sh loop (SURVEY.md §4.3-4).
"""

import numpy as np
import pytest

from monoorbslam3_tpu.evaluation.ate import ate_rmse
from monoorbslam3_tpu.evaluation.metrics import load_tum, load_velocity_file
from monoorbslam3_tpu.models.camera import Pinhole
from monoorbslam3_tpu.sim import ImageWorld, Trajectory

from tests.test_e2e_synthetic import BA_TRUE, BG_TRUE, R_BC, T_BC

CAM = Pinhole.create(fx=380.0, fy=380.0, cx=256.0, cy=192.0,
                     width=512, height=384)
FPS = 20.0
T_END = 3.0  # 60 frames: init + sustained tracking, CPU-budget friendly

SETTINGS_YAML = """\
Camera:
  Width: 512
  Height: 384
  fps: 20
  CameraMatrix: [380.0, 0, 256.0, 0, 380.0, 192.0, 0, 0, 1.0]
  Distortion: [0, 0, 0, 0]
  DistortionModel: radtan
ORB:
  Features: 768
  ScaleFactor: 1.2
  Levels: 8
  IniThFAST: 20
  MinThFAST: 7
IMU:
  NoiseGyro: 1.7e-4
  WalkGyro: 2.0e-5
  NoiseAcc: 2.0e-3
  WalkAcc: 3.0e-3
  Frequency: 200
  GyroBias: [0, 0, 0]
  AccBias: [0, 0, 0]
  Rbc: [{rbc}]
  tbc: [{tbc}]
System:
  init_min_features: 100
  init_min_matches: 60
  local_k: 16
  local_p: 1024
  local_o: 3072
  local_pt_cap: 1024
  imu_init_kfs: 10
  max_pt: 16384
  kf_max_interval: 0.25
  kf_tracked_ratio: 0.85
"""


@pytest.fixture(scope="module")
def euroc_disk(tmp_path_factory):
    """Render an EuRoC-layout dataset to disk + its ground-truth sampler."""
    from PIL import Image

    root = tmp_path_factory.mktemp("euroc_seq")
    (root / "cam0" / "data").mkdir(parents=True)

    traj = Trajectory()
    world = ImageWorld(traj=traj)
    rng = np.random.default_rng(9)
    times = np.arange(0.0, T_END, 1.0 / FPS)
    with open(root / "cam0" / "times.txt", "w") as f:
        for i, t in enumerate(times):
            img = world.render(t, CAM, R_BC, T_BC, noise=1.0, rng=rng)
            u8 = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
            Image.fromarray(u8).save(root / "cam0" / "data" / ("%08d.png" % i))
            f.write(f"{t:.6f}\n")

    g, a, d = traj.imu_samples(0.0, T_END, 200.0, bg=BG_TRUE, ba=BA_TRUE,
                               noise_gyro=1.7e-4, noise_acc=2e-3, rng=rng)
    ts = np.cumsum(d)
    with open(root / "imu.txt", "w") as f:
        for row in np.concatenate([ts[:, None], g, a], axis=1):
            f.write(" ".join(f"{x:.9f}" for x in row) + "\n")

    yaml_path = root / "settings.yaml"
    yaml_path.write_text(SETTINGS_YAML.format(
        rbc=", ".join(f"{x:.12f}" for x in np.asarray(R_BC).ravel()),
        tbc=", ".join(f"{x:.12f}" for x in np.asarray(T_BC))))
    return root, yaml_path, traj


@pytest.fixture(scope="module")
def cli_run(euroc_disk, tmp_path_factory):
    from monoorbslam3_tpu.runners.datasets import main

    root, yaml_path, traj = euroc_disk
    out = tmp_path_factory.mktemp("out")
    main(["euroc", str(yaml_path), str(root), str(out / "traj.txt"),
          "--velocity-out", str(out / "vel.txt"),
          "--map-out", str(out / "map.pcd"),
          "--depth-out", str(out / "depth.txt")])
    return out, traj


def test_cli_trajectory_accuracy(cli_run):
    out, traj = cli_run
    t_kf, p_kf, q_kf = load_tum(str(out / "traj.txt"))
    assert len(t_kf) >= 5, f"only {len(t_kf)} keyframes exported"
    assert np.isfinite(p_kf).all() and np.isfinite(q_kf).all()
    res = ate_rmse(t_kf, p_kf, t_kf, traj.pos(t_kf))
    assert res["n_matches"] == len(t_kf)
    assert res["rmse"] < 0.25, (
        f"CLI-path KF ATE RMSE {res['rmse'] * 100:.0f} cm")


def test_cli_export_surfaces(cli_run):
    out, traj = cli_run
    t_v, v, bg, ba = load_velocity_file(str(out / "vel.txt"))
    t_kf, _, _ = load_tum(str(out / "traj.txt"))
    assert len(t_v) == len(t_kf)
    assert np.isfinite(v).all()

    pcd = (out / "map.pcd").read_text().splitlines()
    n_declared = next(int(line.split()[1]) for line in pcd
                      if line.startswith("POINTS"))
    assert n_declared > 100, f"PCD map has only {n_declared} points"
    data_at = pcd.index("DATA ascii") + 1
    assert len(pcd) - data_at == n_declared

    depth = (out / "depth.txt").read_text().splitlines()
    assert len(depth) > 0
