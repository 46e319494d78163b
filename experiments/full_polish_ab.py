"""Quick functional check of the large full-inertial polish path on the
feature-injection world: with local_k=16 a 25 s run exceeds the window
capacity by t~6, so every later maintenance refinement routes through the
grouped-obs full_k problem (VERDICT r03 item #3). Prints ATE + whether the
grouped solve fired.

Usage: python experiments/full_polish_ab.py [t_end]
"""

import logging
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
import test_e2e_synthetic as h  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main():
    t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
    sysm, states, ntracks, frame_times, traj, world = h._run_pipeline(t_end)
    from monoorbslam3_tpu.evaluation.ate import umeyama_align

    ids = sysm.store.keyframe_ids()
    kt = np.array([sysm.store.kf_time[k] for k in ids])
    kp = np.stack([sysm.store.kf_t[k] for k in ids])
    gt = traj.pos(kt)
    s, R, tt = umeyama_align(kp, gt)
    err = np.linalg.norm((s * kp @ R.T + tt) - gt, axis=1)
    rmse = float(np.sqrt((err ** 2).mean()))
    print(f"t_end={t_end} frames={len(states)} ok={(states == 2).mean():.2f} "
          f"lost={(states == 4).sum()} kfs={len(ids)} "
          f"ATE={rmse * 100:.1f}cm scale_err={abs(s - 1) * 100:.1f}%")


if __name__ == "__main__":
    main()
