"""Per-segment gauge profile of an exported trajectory vs ground truth.

The corridor world ends with ~19-21% export scale error while LATE
whole-chain scale re-estimates read ~1.00 at rel-sigma ~0.007 (the map is
IMU-metric-consistent). Hypothesis: the final map is NOT at one uniform
gauge — early-chain keyframes sit at a different scale than the late
chain (drift shear), which a Horn fit averages into the export number.
This tool fits scale over sliding windows of keyframes to localize where
the gauge error lives.

Usage: python experiments/gauge_profile.py est.txt gt.txt [window]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from monoorbslam3_tpu.evaluation.ate import associate, umeyama_align


def load_tum(path):
    data = np.loadtxt(path)
    return data[:, 0], data[:, 1:4]


def main():
    est_f, gt_f, *rest = sys.argv[1:]
    win = int(rest[0]) if rest else 20
    t_e, p_e = load_tum(est_f)
    t_g, p_g = load_tum(gt_f)
    ie, ig = associate(t_e, t_g, max_dt=0.05)
    p_e, p_g, t_e = p_e[ie], p_g[ig], t_e[ie]
    n = len(p_e)
    print(f"{n} matched poses, t = [{t_e[0]:.1f}, {t_e[-1]:.1f}]")

    # global fit for reference
    s, R, t = umeyama_align(p_e, p_g, with_scale=True)
    err = np.linalg.norm((s * p_e @ R.T + t) - p_g, axis=1)
    print(f"global: scale {s:.3f}, ATE rmse {np.sqrt((err**2).mean()):.3f} m")

    print(f"\nsliding window = {win} poses:")
    print("t_mid   scale   seg_rmse_m")
    for s0 in range(0, n - win + 1, max(win // 2, 1)):
        seg = slice(s0, s0 + win)
        sw, Rw, tw = umeyama_align(p_e[seg], p_g[seg], with_scale=True)
        ew = np.linalg.norm((sw * p_e[seg] @ Rw.T + tw) - p_g[seg], axis=1)
        print(f"{t_e[seg].mean():6.1f}  {sw:6.3f}  "
              f"{np.sqrt((ew**2).mean()):8.3f}")


if __name__ == "__main__":
    main()
