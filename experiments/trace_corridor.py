"""Corridor starvation trace (STATUS.md round-3 open item #5).

Runs corridor60 through the public System path with the local-map stage
instrumented: per frame, records how many candidates the harvest offers,
how many are in view / within the scale-invariance distance band, how
many match, how many survive as inliers, and the age distribution of the
matched points. Dumps /tmp/corridor_trace.npz for offline analysis.

Usage: python experiments/trace_corridor.py [--t-end 60] [--out ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-end", type=float, default=60.0)
    ap.add_argument("--fps", type=float, default=10.0)
    ap.add_argument("--world", default="corridor")
    ap.add_argument("--settings", default=None)
    ap.add_argument("--out", default="/tmp/corridor_trace.npz")
    ap.add_argument("--oracle-depth", action="store_true",
                    help="ablation: snap every new triangulation onto the "
                    "true corridor surface (scaled to the live gauge) — "
                    "isolates triangulation depth bias as a drift driver")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.runners.datasets import run_sequence
    from monoorbslam3_tpu.runners.synth import SyntheticDataset

    settings = args.settings or (
        "settings/synthetic_forward.yaml" if args.world == "corridor"
        else "settings/synthetic.yaml")
    system = build_system(settings)
    dataset = SyntheticDataset(
        f"{args.world}:t_end={args.t_end},fps={args.fps}", system.camera,
        system.calib)

    tr = system.tracking
    store = system.store
    rows = []

    if args.oracle_depth:
        world = dataset.world

        def _gt_ray_depth(o_w, d_w):
            """min positive ray-plane intersection with the corridor."""
            best = np.inf
            planes = [(1, world.half_width), (1, -world.half_width),
                      (2, world.ground_z), (0, world.length)]
            for axis, value in planes:
                dn = d_w[axis]
                if abs(dn) < 1e-9:
                    continue
                s = (value - o_w[axis]) / dn
                if 0.1 < s < best:
                    p = o_w + s * d_w
                    if axis == 1 and p[2] > world.facade_top:
                        continue
                    best = s
            return best

        orig_add_point = store.add_point
        R_cb = np.asarray(system.calib.R_cb)
        t_cb = np.asarray(system.calib.t_cb)
        snap_stats = []

        def add_point_oracle(xyz, desc, first_kf):
            gauge = _live_local_scale()
            R_cw, t_cw = store.kf_pose_cw(first_kf, R_cb, t_cb)
            o_est = -R_cw.T @ t_cw
            d = np.asarray(xyz) - o_est
            z_est = np.linalg.norm(d)
            d /= max(z_est, 1e-9)
            # ray in TRUE world frame: the est map is in (approx) the same
            # frame post-init; use gt camera center for the ray origin to
            # decouple pose error from depth error
            t_kf = float(store.kf_time[first_kf])
            R_wb_gt = dataset.traj.R_wb(t_kf)
            o_gt = dataset.traj.pos(t_kf) + R_wb_gt @ np.asarray(
                system.calib.t_bc)
            R_wc_gt = R_wb_gt @ np.asarray(system.calib.R_bc)
            d_gt = R_wc_gt @ (R_cw @ d)  # est cam dir -> gt world
            s_gt = _gt_ray_depth(o_gt, d_gt)
            if np.isfinite(s_gt) and gauge > 1e-6:
                snap_stats.append(z_est / (s_gt * gauge))
                xyz = o_est + d * (s_gt * gauge)
            return orig_add_point(xyz, desc, first_kf)

        store.add_point = add_point_oracle

    orig_harvest = tr._harvest_local_points
    harvest_stats = {}

    probe_every = 2.0
    probe_last = [-10.0]

    def harvest_wrap(frame):
        pids = orig_harvest(frame)
        st = frame.state
        # replicate the in-view / band statistics over the offered set
        center = np.asarray(st.t_wb) + np.asarray(st.R_wb) @ (
            -np.asarray(tr.calib.R_cb).T @ np.asarray(tr.calib.t_cb))
        xyz = store.pt_xyz[pids]
        dist = np.linalg.norm(xyz - center, axis=1)
        uv, ok = tr._project(st, xyz)
        in_band = (dist > 0.8 * store.pt_min_dist[pids]) & (
            dist < 1.2 * store.pt_max_dist[pids])
        n_valid_map = int(store.pt_valid.sum())
        first_kf = np.maximum(store.pt_obs_kf[pids, 0], 0)
        ages = frame.time - store.kf_time[first_kf]
        old = ok & (ages > 2.0)
        harvest_stats.update(
            n_offered=len(pids), n_in_view=int(ok.sum()),
            n_in_band=int((ok & in_band).sum()), n_map=n_valid_map,
            n_old_in_view=int(old.sum()),
            cap_hit=int(len(pids) >= tr.local_pt_cap))
        # old-point autopsy: why do old in-view points not match? For each,
        # best Hamming distance to ANY frame feature + the pixel offset of
        # that best feature from the projection.
        if frame.time - probe_last[0] >= probe_every and old.sum() >= 5:
            probe_last[0] = frame.time
            uv_np = np.asarray(uv)
            pd = store.pt_desc[pids[old]]              # [M, 8] u32
            fd = np.asarray(frame.desc)[np.asarray(frame.valid)]
            fxy = np.asarray(frame.xy)[np.asarray(frame.valid)]
            x = pd[:, None, :] ^ fd[None, :, :]
            ham = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
            best = ham.argmin(1)
            bestd = ham.min(1)
            off = np.linalg.norm(fxy[best] - uv_np[old], axis=1)
            # also: offset of the best feature WITHIN hamming<=50
            okm = bestd <= 50
            print(f"  [probe t={frame.time:.1f}] old_in_view={old.sum()} "
                  f"bestham med={np.median(bestd):.0f} "
                  f"p25={np.percentile(bestd,25):.0f} "
                  f"desc_ok={okm.mean():.2f} "
                  f"off med={np.median(off):.1f}px "
                  f"off|desc_ok med="
                  f"{np.median(off[okm]) if okm.any() else -1:.1f}px",
                  flush=True)
        return pids

    tr._harvest_local_points = harvest_wrap

    orig_tlm = tr._track_local_map
    mapper = system.mapper

    def _live_local_scale():
        """|Δp_est| / |Δp_gt| over the newest KF pair — the live gauge."""
        ids = store.keyframe_ids()
        if len(ids) < 2:
            return 0.0
        a, b = ids[-2], ids[-1]
        de = float(np.linalg.norm(store.kf_t[b] - store.kf_t[a]))
        ta, tb = float(store.kf_time[a]), float(store.kf_time[b])
        pa = dataset.traj.pos(ta)
        pb = dataset.traj.pos(tb)
        dg = float(np.linalg.norm(pb - pa))
        return de / max(dg, 1e-9)

    def tlm_wrap(frame):
        out = orig_tlm(frame)
        sel = np.nonzero(frame.pt_ids >= 0)[0]
        pids = frame.pt_ids[sel]
        if len(pids):
            first_kf = store.pt_obs_kf[pids, 0]
            ages = frame.time - store.kf_time[np.maximum(first_kf, 0)]
        else:
            ages = np.zeros(0)
        info = mapper.last_info or {}
        rows.append(dict(
            t=frame.time, state=tr.state, n_tracked=frame.n_tracked,
            n_assoc=len(sel),
            age_med=float(np.median(ages)) if len(ages) else 0.0,
            age_p90=float(np.percentile(ages, 90)) if len(ages) else 0.0,
            frac_young=float((ages < 2.0).mean()) if len(ages) else 0.0,
            imu_state=int(mapper.imu_state),
            ba_n_ie=int(info.get("n_ie", -1)),
            ba_cost=float(info.get("cost", -1.0)),
            ba_cost0=float(info.get("cost0", -1.0)),
            live_scale=_live_local_scale(),
            **harvest_stats))
        return out

    tr._track_local_map = tlm_wrap

    t0 = time.perf_counter()
    states = run_sequence(system, dataset, progress_every=100)
    print(f"run done in {time.perf_counter() - t0:.0f}s, "
          f"lost={int((states == 4).sum())}")
    system.shutdown()
    est = f"/tmp/{args.world}_trace_est.txt"
    gt = f"/tmp/{args.world}_trace_gt.txt"
    system.save_keyframe_trajectory(est)
    dataset.save_ground_truth(gt)
    from monoorbslam3_tpu.evaluation.metrics import evaluate_sequences
    if os.path.getsize(est):
        (res,) = evaluate_sequences([(args.world, est, gt)], max_dt=0.05)
        print(f"ATE {res['rmse']*100:.1f} cm scale {res['scale']:.3f}")

    if args.oracle_depth and snap_stats:
        ss = np.asarray(snap_stats)
        print(f"oracle-depth: snapped {len(ss)} points, est/gt depth ratio "
              f"p10/p50/p90 = {np.percentile(ss,10):.3f}/"
              f"{np.percentile(ss,50):.3f}/{np.percentile(ss,90):.3f}")
    keys = sorted(rows[0].keys()) if rows else []
    np.savez(args.out, **{k: np.array([r.get(k, 0) for r in rows])
                          for k in keys})
    print(f"saved {len(rows)} rows -> {args.out}")
    # quick textual summary every 2 s
    for r in rows[:: int(2 * args.fps)]:
        print(f"t={r['t']:5.1f} map={r['n_map']:5d} off={r['n_offered']:4d} "
              f"view={r['n_in_view']:4d} assoc={r['n_assoc']:3d} "
              f"inl={r['n_tracked']:3d} young={r['frac_young']:.2f} "
              f"imu={r['imu_state']} n_ie={r['ba_n_ie']:3d} "
              f"ba={r['ba_cost0']:9.1f}->{r['ba_cost']:9.1f} "
              f"gauge={r['live_scale']:.3f}")


if __name__ == "__main__":
    main()
