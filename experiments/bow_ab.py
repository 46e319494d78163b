"""BoW-gate cost A/B on a recapture-heavy world (VERDICT r04 weak #7).

The 100k-leaf vocabulary's node gate keeps 78% of dense matches at the
reference's granularity (VOCAB_BENCH_r04.json). Where the gate is
load-bearing for parity claims — SearchByBow on the reference-KF match
and recapture (ORBMatcher.cpp:118-201) — that 22% loss was unquantified
end-to-end. This A/B runs the SAME world (fastspin: sustained 52 deg/s
sweep, the loss/recapture-heavy regime; two mid-run RECENTLY_LOST
recoveries in the round-3 record) with the vocabulary on vs off and
records losses, recapture latency, ATE, and scale error.

Usage: python experiments/bow_ab.py [--world fastspin:t_end=30,fps=20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def run(world_spec: str, use_vocab: bool):
    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.evaluation.metrics import evaluate_sequences
    from monoorbslam3_tpu.frontend import tracking as T
    from monoorbslam3_tpu.runners.datasets import run_sequence
    from monoorbslam3_tpu.runners.synth import SyntheticDataset

    settings = ("settings/synthetic_vocab.yaml" if use_vocab
                else "settings/synthetic.yaml")
    system = build_system(settings)
    assert (system.vocab is not None) == use_vocab
    dataset = SyntheticDataset(world_spec, system.camera, system.calib)
    tag = "bow" if use_vocab else "dense"
    est = f"/tmp/bow_ab_{tag}_est.txt"
    gt = f"/tmp/bow_ab_{tag}_gt.txt"
    dataset.save_ground_truth(gt)

    # recapture latency: time from entering RECENTLY_LOST to next OK
    t0 = time.perf_counter()
    states = run_sequence(system, dataset, progress_every=200)
    wall = time.perf_counter() - t0
    system.shutdown()
    system.save_keyframe_trajectory(est)

    times = np.asarray(dataset.times[: len(states)])
    recaptures = []
    lost_t = None
    for s, t in zip(states, times):
        if s == T.RECENTLY_LOST and lost_t is None:
            lost_t = t
        elif s == T.OK and lost_t is not None:
            recaptures.append(round(float(t - lost_t), 2))
            lost_t = None
    (res,) = evaluate_sequences([(tag, est, gt)], max_dt=0.05)
    return {
        "vocab": use_vocab, "frames": len(states),
        "ok_frames": int((states == T.OK).sum()),
        "lost_events": int((states == T.LOST).sum()),
        "recently_lost_frames": int((states == T.RECENTLY_LOST).sum()),
        "recapture_latencies_s": recaptures,
        "ate_cm": round(float(res["rmse"]) * 100, 1),
        "scale_err_pct": round(abs(float(res["scale"]) - 1.0) * 100, 1),
        "wall_s": round(wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--world", default="fastspin:t_end=30,fps=20")
    ap.add_argument("--out", default="BOW_AB_r05.json")
    args = ap.parse_args()
    rows = []
    for use_vocab in (True, False):
        row = run(args.world, use_vocab)
        row["world"] = args.world
        print(json.dumps(row), flush=True)
        rows.append(row)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
