"""Distributed BA must match the single-chip solver (8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from monoorbslam3_tpu.backend.solver import schur_ba
from monoorbslam3_tpu.parallel.sharded_ba import (
    shard_problem_by_point, sharded_schur_ba,
)
from tests.test_solver import CAM, R_CB, T_CB, _build_ba_problem


def _pad_problem(problem, n_shards):
    """Pad points/obs capacities to multiples of the shard count."""
    P = problem.points.shape[0]
    O = problem.obs_kf.shape[0]
    P_pad = -(-P // n_shards) * n_shards - P
    O_pad = -(-O // n_shards) * n_shards - O
    if P_pad:
        problem = problem._replace(
            points=jnp.pad(problem.points, ((0, P_pad), (0, 0))),
            pt_active=jnp.pad(problem.pt_active, (0, P_pad)),
        )
    if O_pad:
        problem = problem._replace(
            obs_kf=jnp.pad(problem.obs_kf, (0, O_pad)),
            obs_pt=jnp.pad(problem.obs_pt, (0, O_pad)),
            obs_uv=jnp.pad(problem.obs_uv, ((0, O_pad), (0, 0))),
            obs_inv_sigma2=jnp.pad(problem.obs_inv_sigma2, (0, O_pad),
                                   constant_values=1.0),
            obs_valid=jnp.pad(problem.obs_valid, (0, O_pad)),
        )
    return problem


def test_sharded_matches_single_chip():
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devices, ("dp",))

    problem, kf_gt, pts_gt = _build_ba_problem(n_kf=6, n_pts=200)
    problem = _pad_problem(problem, 8)
    sharded, dropped = shard_problem_by_point(problem, 8)
    assert dropped == 0

    kf_s, pts_s, info_s = sharded_schur_ba(sharded, CAM, R_CB, T_CB, mesh,
                                           n_iters=8)
    kf_1, pts_1, info_1 = schur_ba(problem, CAM, R_CB, T_CB, n_iters=8)

    # both converge to the same optimum (identical math, different reduction
    # order -> allow small float32 slack)
    assert float(info_s["cost"]) < float(info_s["cost0"]) * 0.5
    rel = abs(float(info_s["cost"]) - float(info_1["cost"])) / float(info_1["cost"])
    assert rel < 0.05, f"cost mismatch {info_s['cost']} vs {info_1['cost']}"
    np.testing.assert_allclose(np.asarray(kf_s.t_wb), np.asarray(kf_1.t_wb),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(kf_s.R_wb), np.asarray(kf_1.R_wb),
                               atol=2e-3)


def test_shard_grouping_preserves_observations():
    problem, *_ = _build_ba_problem(n_kf=4, n_pts=120)
    problem = _pad_problem(problem, 8)
    sharded, dropped = shard_problem_by_point(problem, 8)
    assert dropped == 0
    # every valid observation preserved with identical (kf, pt, uv)
    def obs_set(p):
        ok = np.asarray(p.obs_valid)
        return set(
            (int(a), int(b), float(u), float(v))
            for a, b, (u, v) in zip(
                np.asarray(p.obs_kf)[ok], np.asarray(p.obs_pt)[ok],
                np.asarray(p.obs_uv)[ok])
        )
    assert obs_set(problem) == obs_set(sharded)
