"""End-to-end System run ON THE REAL TPU (VERDICT r03 item #1).

Drives synthetic battery worlds through the full public System loop —
extractor, matching, frame LM, async mapper with window BA — on the real
chip (backend axon via the remote tunnel), and records:

- achieved frames/s and the real-time factor vs the camera rate (the
  reference's whole-system bar: demos sleep to hold camera fps,
  /root/reference/test/eurocDemo.cpp:52-70);
- a per-stage wall-clock split (extract / match+poseLM via tracking /
  mapper BA / triangulate+fuse / inertial init+refine), attributed by
  host timers around each stage;
- tunnel RTT probes sampled during the run (CLAUDE.md: per-call RTT is
  bimodal 0.1..50 ms — the probe separates tunnel weather from compute);
- final ATE/scale vs ground truth, comparable with the CPU battery.

Host timers here measure the TUNNEL-INCLUSIVE reality of this setup (a
dispatch+block round trip per stage); the kernel-only numbers live in
bench.py. Usage:

  python experiments/tpu_e2e.py --worlds circle60,corridor60 \
      --out TPU_E2E_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORLDS = {
    "circle60": ("settings/synthetic.yaml", "circle:t_end=60,fps=20", 20.0),
    "circle10": ("settings/synthetic.yaml", "circle:t_end=10,fps=20", 20.0),
    "corridor60": ("settings/synthetic_forward.yaml",
                   "corridor:t_end=60,fps=10", 10.0),
}


class StageClock:
    """Cumulative wall-clock per named stage via method wrapping."""

    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    def wrap(self, obj, name, stage):
        fn = getattr(obj, name)
        clock = self

        class Timed:
            """Callable proxy: times __call__, forwards attribute access
            (the extractor slot is an object with scale_factors etc.)."""

            def __call__(self, *a, **kw):
                t0 = time.perf_counter()
                try:
                    return fn(*a, **kw)
                finally:
                    dt = time.perf_counter() - t0
                    clock.total[stage] += dt
                    clock.count[stage] += 1

            def __getattr__(self, attr):
                return getattr(fn, attr)

        setattr(obj, name, Timed())


def rtt_probe_fn():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.eye(8)
    jax.block_until_ready(f(x))  # compile

    def probe():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return probe


def run_world(name, out_dir, sync=False):
    import jax

    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.evaluation.metrics import evaluate_sequences
    from monoorbslam3_tpu.runners.synth import SyntheticDataset

    settings, spec, cam_fps = WORLDS[name]
    est = os.path.join(out_dir, f"{name}_tpu_est.txt")
    gt = os.path.join(out_dir, f"{name}_tpu_gt.txt")
    # async mapper: the reference's pipelined two-thread topology
    # (System.cpp:55); KF backpressure + idle gating live. --sync runs
    # the deterministic synchronous mapper instead (the corridor init
    # defer-cycled under async interleaving at tunnel pacing, r04).
    system = build_system(settings, async_mapper=not sync)
    dataset = SyntheticDataset(spec, system.camera, system.calib)
    dataset.save_ground_truth(gt)

    clock = StageClock()
    # tracker-thread stages
    clock.wrap(system, "extractor", "extract")
    clock.wrap(system.tracking, "track_feats", "track(match+poseLM)")
    # mapper-thread stages (overlap the tracker under async)
    mp = system.mapper
    clock.wrap(mp, "create_new_map_points", "mapper:triangulate")
    clock.wrap(mp, "fuse_neighbors", "mapper:fuse")
    clock.wrap(mp, "initialize_imu", "mapper:imu_init")
    clock.wrap(mp, "refine_gravity", "mapper:vi_refine")
    clock.wrap(system.problems, "run_window_ba", "mapper:window_ba")

    probe = rtt_probe_fn()
    rtts = []

    print(f"[{name}] warmup (cold XLA compiles over the tunnel, "
          "3-8 min for the window BA)...", flush=True)
    t0 = time.perf_counter()
    system.warmup()
    warmup_s = time.perf_counter() - t0
    print(f"[{name}] warmup done in {warmup_s:.1f}s", flush=True)

    # render all frames FIRST: host-numpy ray-casting is the validation
    # surface, not the system under test (run_validation excludes it too
    # by measuring only wall inside run_sequence; here we exclude it by
    # pre-rendering so the loop is pure System time)
    def _jit_cache_census():
        """Total compiled-variant count across the hot jitted programs —
        growth between warmup end and run end means MID-RUN COMPILES,
        the prime suspect for the r04 on-chip p99 tail (VERDICT weak #5).
        The CPU battery's jit-cache regression test has no on-chip
        equivalent; this is it."""
        import monoorbslam3_tpu.backend.problems as P
        import monoorbslam3_tpu.frontend.local_mapping as L
        import monoorbslam3_tpu.frontend.tracking as T
        fns = [P._pose_optimize_impl, P.schur_ba, T._coarse_track_kernel,
               T._local_track_kernel, T._predict_deltas,
               L._triangulate_pair_kernel, L._fuse_project_kernel]
        # per-instance jits (preintegration batch + whitening): the r05
        # census runs attributed ~10 residual mid-run compiles to shapes
        # outside the module-level set — include the Problems-bound jits
        prob = system.problems
        fns += [prob._preint_batch, prob._whiten_batch]
        total = 0
        for f in fns:
            try:
                total += f._cache_size()
            except Exception:
                pass
        return total

    cache_after_warmup = _jit_cache_census()
    frames = list(dataset.frames())
    states = []
    frame_ms = []
    frame_syncs = []  # blocking device reads per frame (utils/fetch.py);
    # under async the mapper thread's fetches land in whichever frame is
    # active, so per-frame numbers attribute tracker+concurrent-mapper
    from monoorbslam3_tpu.utils.fetch import sync_count
    t_run0 = time.perf_counter()
    for i, (t, img, imu) in enumerate(frames):
        f0 = time.perf_counter()
        s0 = sync_count()
        states.append(system.track(t, img, imu))
        frame_syncs.append(sync_count() - s0)
        frame_ms.append((time.perf_counter() - f0) * 1e3)
        if i % 50 == 0:
            rtts.append(probe() * 1e3)
        if i % 25 == 0:
            recent = float(np.mean(frame_ms[-25:]))
            print(f"[{name}] frame {i}/{len(frames)} state={states[-1]} "
                  f"kf={system.store.n_keyframes()} "
                  f"rtt={rtts[-1]:.2f}ms frame_ms={recent:.0f}", flush=True)
    wall = time.perf_counter() - t_run0
    system.shutdown()
    system.save_keyframe_trajectory(est)

    states = np.asarray(states)
    (res,) = evaluate_sequences([(name, est, gt)], max_dt=0.05)
    fps = len(frames) / wall
    frame_ms = np.asarray(frame_ms)
    row = {
        "world": name, "spec": spec, "device": str(jax.devices()[0]),
        "mapper": "sync" if sync else "async",
        "frames": len(frames), "wall_s": round(wall, 2),
        "fps": round(fps, 2), "camera_fps": cam_fps,
        "realtime_factor": round(fps / cam_fps, 2),
        "warmup_s": round(warmup_s, 1),
        "frame_ms": {"p50": round(float(np.percentile(frame_ms, 50)), 2),
                     "p90": round(float(np.percentile(frame_ms, 90)), 2),
                     "p99": round(float(np.percentile(frame_ms, 99)), 2),
                     "max": round(float(frame_ms.max()), 2)},
        "tunnel_rtt_ms": {"min": round(float(np.min(rtts)), 3),
                          "p50": round(float(np.median(rtts)), 3),
                          "max": round(float(np.max(rtts)), 3)},
        # round-5 dispatch accounting (VERDICT r04 item 3): sync points =
        # blocking device reads per frame; everything else pipelines
        # (experiments/rtt_probe.py). frame_wall_net_rtt estimates the
        # on-hardware frame time with the tunnel removed.
        "sync_points_per_frame": {
            "p50": float(np.percentile(frame_syncs, 50)),
            "p90": float(np.percentile(frame_syncs, 90)),
            "mean": round(float(np.mean(frame_syncs)), 2),
            "total": int(np.sum(frame_syncs))},
        "jit_variants_after_warmup": cache_after_warmup,
        "jit_variants_after_run": _jit_cache_census(),
        "frame_wall_net_rtt_ms": round(
            float(np.percentile(frame_ms, 50))
            - float(np.percentile(frame_syncs, 50)) * float(np.median(rtts)),
            2),
        "ok_frames": int((states == 2).sum()),
        "lost_events": int((states == 4).sum()),
        "n_keyframes": system.store.n_keyframes(),
        "ate_rmse": round(float(res["rmse"]), 4),
        "scale_err": round(abs(float(res["scale"]) - 1.0), 4),
        "stage_wall_s": {k: round(v, 2) for k, v in
                         sorted(clock.total.items())},
        "stage_calls": dict(sorted(clock.count.items())),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", default="circle60,corridor60")
    ap.add_argument("--out", default="TPU_E2E_r04.json")
    ap.add_argument("--out-dir", default="/tmp/tpu_e2e")
    ap.add_argument("--sync", action="store_true")
    ap.add_argument("--append", action="store_true",
                    help="merge rows into an existing --out artifact")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    rows = [run_world(n, args.out_dir, sync=args.sync)
            for n in args.worlds.split(",")]
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f) + rows
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
