"""A/B the over-capacity full-inertial polish mode on corridor60.

Round-4 probe: the d7ca46f all-KF grouped polish took corridor60 from
2.10 m / 21.3% (round 3, capped polish) to 27.8 m / 95.5% — progressive
gauge contraction (segment scale 1.03 -> 3.0 along the trajectory,
experiments/gauge_profile.py). This isolates WHICH polish behavior drives
it: mode in {grouped, capped, off}.

Usage: python experiments/corridor_ab.py <mode> [spec]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    mode = sys.argv[1]
    spec = sys.argv[2] if len(sys.argv) > 2 else "corridor:t_end=60,fps=10"
    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.evaluation.metrics import evaluate_sequences
    from monoorbslam3_tpu.runners.datasets import run_sequence
    from monoorbslam3_tpu.runners.synth import SyntheticDataset

    out_dir = "/tmp/corridor_ab_" + mode.replace(":", "_").replace(
        ",", "_").replace("=", "")
    os.makedirs(out_dir, exist_ok=True)
    est, gt = f"{out_dir}/est.txt", f"{out_dir}/gt.txt"
    overrides = {}
    if ":" in mode:  # e.g. grouped:full_k=40,window_layout=flat
        mode, rest = mode.split(":", 1)
        for kv in rest.split(","):
            k, v = kv.split("=")
            try:
                overrides[k] = int(v)
            except ValueError:
                overrides[k] = v
    overrides["full_polish_mode"] = mode
    system = build_system("settings/synthetic_forward.yaml",
                          config_overrides=overrides)
    dataset = SyntheticDataset(spec, system.camera, system.calib)
    dataset.save_ground_truth(gt)
    t0 = time.perf_counter()
    states = run_sequence(system, dataset, progress_every=100)
    system.shutdown()
    system.save_keyframe_trajectory(est)
    (res,) = evaluate_sequences([(mode, est, gt)], max_dt=0.05)
    print(json.dumps({
        "mode": mode, "spec": spec,
        "wall_s": round(time.perf_counter() - t0, 1),
        "lost": int((states == 4).sum()),
        "ate_rmse": round(float(res["rmse"]), 3),
        "scale_err": round(abs(float(res["scale"]) - 1.0), 4),
        "n_keyframes": system.store.n_keyframes(),
    }))


if __name__ == "__main__":
    main()
