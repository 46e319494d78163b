"""Surgical comparison of full-polish modes on ONE captured map state.

Loads the corridor map saved at t=20 (~68 KFs, inertial-initialized),
runs `full_inertial_optimize` under each mode on identical copies, and
measures against ground truth:

- Horn scale + ATE of the KF chain before / after 1 and 3 polishes;
- per-segment gauge (first vs last third) to see WHERE each mode moves
  the chain.

At this size the grouped path covers every KF directly (no stride
subsample, no merged edges, no propagation), so a defect here indicts
the grouped big-problem solve itself; a clean result here pushes the
defect into the >96-KF machinery.

Usage: python experiments/polish_surgery.py [state.npz gt_dir]
"""

import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def gauge(store, traj):
    ids = store.keyframe_ids()
    kt = np.array([store.kf_time[k] for k in ids])
    kp = np.stack([store.kf_t[k] for k in ids])
    gt = traj.pos(kt)
    from monoorbslam3_tpu.evaluation.ate import umeyama_align

    s, R, t = umeyama_align(kp, gt)
    err = np.linalg.norm((s * kp @ R.T + t) - gt, axis=1)
    n = len(ids)
    s1, _, _ = umeyama_align(kp[: n // 3], gt[: n // 3])
    s3, _, _ = umeyama_align(kp[-n // 3:], gt[-n // 3:])
    return {"scale": round(float(s), 4),
            "ate_cm": round(float(np.sqrt((err ** 2).mean()) * 100), 1),
            "seg_scale_first_third": round(float(s1), 4),
            "seg_scale_last_third": round(float(s3), 4),
            "n_kf": n}


def main():
    state = sys.argv[1] if len(sys.argv) > 1 else "/tmp/state20/state.npz"
    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.runners.synth import make_world

    _, traj, _ = make_world("corridor", {})

    rows = {}
    for mode in ("none", "capped", "grouped", "grouped_nomerge", "recent"):
        system = build_system("settings/synthetic_forward.yaml",
                              config_overrides={"window_layout": "flat",
                                                "full_polish_mode": mode})
        system.load_state(state)
        store = system.store
        pre = gauge(store, traj)
        hist = [pre]
        if mode != "none":
            for _ in range(3):
                system.problems.full_inertial_optimize(store)
                hist.append(gauge(store, traj))
        rows[mode] = hist
        print(json.dumps({mode: hist}), flush=True)
    with open("/tmp/polish_surgery.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
