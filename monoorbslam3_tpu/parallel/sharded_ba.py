"""Distributed Schur-complement bundle adjustment over a device mesh.

TPU-native replacement for the reference's single-machine shared-memory
concurrency (SURVEY.md §2.3): the mutex-guarded map becomes explicitly
sharded state, and the local/full BA's landmark reduction is distributed
with `shard_map` + `psum` over ICI (BASELINE.json north star).

Sharding layout (one mesh axis, "dp"):
- landmarks and their observations are partitioned BY POINT across devices
  (the host groups each point's observations onto its shard);
- per-shard: visual linearization, landmark Hessian blocks Hll, their
  inverses, and the dense W/Y tensors are fully local;
- the reduced camera system S = Hcc - sum_p Y_p W_p^T and its RHS are
  formed by `psum` over the mesh — one [K,K,15,15] + [K,15] all-reduce
  per iteration riding ICI;
- the small dense solve (<= K*15 dims) is replicated on every device;
- landmark back-substitution is again fully local per shard.

This mirrors the single-chip `schur_ba` exactly (same BAProblem pytree),
so results match up to floating-point reduction order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import residuals as res
from ..backend.solver import (
    BAProblem, CHI2_MONO, _gather_kf, _inertial_linearize, _prior_linearize,
    _retract_problem, _total_cost, _vis_linearize, _walk_linearize, inv3x3,
)


def shard_problem_by_point(problem: BAProblem, n_shards: int) -> BAProblem:
    """Host-side regrouping: order observations so each point's obs land on
    its point-shard. Returns a BAProblem whose points/obs arrays can be
    sharded on their leading axis into `n_shards` equal blocks."""
    import numpy as np

    P_ = problem.points.shape[0]
    assert P_ % n_shards == 0, "pad point capacity to a multiple of n_shards"
    per_pt = P_ // n_shards

    obs_pt = np.asarray(problem.obs_pt)
    obs_valid = np.asarray(problem.obs_valid)
    shard_of_pt = obs_pt // per_pt

    # per-shard capacity sized to the worst shard (no silent drops)
    counts = np.bincount(shard_of_pt[obs_valid], minlength=n_shards)
    per_obs = max(8, int(-(-counts.max() // 8) * 8))
    O_new = per_obs * n_shards

    order = np.zeros(O_new, np.int64)  # default: slot 0 (disabled via mask)
    keep = np.zeros(O_new, bool)
    fill = [0] * n_shards
    for o in np.nonzero(obs_valid)[0]:
        s = int(shard_of_pt[o])
        slot = s * per_obs + fill[s]
        order[slot] = o
        keep[slot] = True
        fill[s] += 1

    idx = jnp.asarray(order)
    return problem._replace(
        obs_kf=problem.obs_kf[idx],
        obs_pt=problem.obs_pt[idx],
        obs_uv=problem.obs_uv[idx],
        obs_inv_sigma2=problem.obs_inv_sigma2[idx],
        obs_valid=problem.obs_valid[idx] & jnp.asarray(keep),
    ), 0


@partial(jax.jit, static_argnames=("mesh", "n_iters", "huber_delta2"))
def sharded_schur_ba(problem: BAProblem, camera, R_cb, t_cb, mesh: Mesh,
                     n_iters: int = 8, huber_delta2: float = CHI2_MONO,
                     lambda0: float = 1e-4):
    """Distributed LM bundle adjustment. `problem` must be pre-grouped with
    `shard_problem_by_point`. Returns (kf, points, info) like schur_ba."""
    K = problem.kf_dof.shape[0]
    axis = mesh.axis_names[0]

    pt_spec = P(axis)
    rep = P()
    in_specs = BAProblem(
        kf=res.KfState(rep, rep, rep, rep, rep),
        kf_dof=rep,
        points=pt_spec, pt_active=pt_spec,
        obs_kf=pt_spec, obs_pt=pt_spec, obs_uv=pt_spec,
        obs_inv_sigma2=pt_spec, obs_valid=pt_spec,
        ie_i=rep, ie_j=rep,
        ie_edge=jax.tree_util.tree_map(lambda _: rep, problem.ie_edge),
        ie_valid=rep, walk_inv_sigma=rep, walk_valid=rep,
        prior_inv_sigma=rep,
        prior_ref=res.KfState(rep, rep, rep, rep, rep),
    )

    P_total = problem.points.shape[0]
    n_shards = mesh.devices.size
    per_pt = P_total // n_shards

    def solve_once_local(pb_local: BAProblem, lam):
        """Runs per-device on the local obs/point shard; camera states are
        replicated. Local obs_pt indices are global — rebase them."""
        shard_id = jax.lax.axis_index(axis)
        pb = pb_local._replace(obs_pt=pb_local.obs_pt - shard_id * per_pt)

        r_v, Jc, Jl, w_v, chi2_v, c_vis = _vis_linearize(pb, camera, R_cb, t_cb, huber_delta2)
        Pl = pb.points.shape[0]

        JcW = Jc * w_v[:, None, None]
        Hc_diag = jnp.einsum("oik,oil->okl", JcW, Jc)
        Hll_o = jnp.einsum("oik,oil->okl", Jl * w_v[:, None, None], Jl)
        W_o = jnp.einsum("oik,oil->okl", JcW, Jl)
        bc_o = -jnp.einsum("oik,oi->ok", JcW, r_v)
        bl_o = -jnp.einsum("oik,oi->ok", Jl * w_v[:, None, None], r_v)

        Hcc = jnp.zeros((K, K, 15, 15), jnp.float32)
        Hcc = Hcc.at[pb.obs_kf, pb.obs_kf].add(Hc_diag)
        b_c = jnp.zeros((K, 15), jnp.float32).at[pb.obs_kf].add(bc_o)
        Hll = jnp.zeros((Pl, 3, 3), jnp.float32).at[pb.obs_pt].add(Hll_o)
        b_l = jnp.zeros((Pl, 3), jnp.float32).at[pb.obs_pt].add(bl_o)
        W_kp = jnp.zeros((K, 15, Pl, 3), jnp.float32).at[
            pb.obs_kf, :, pb.obs_pt, :].add(W_o)

        # inertial + walk + priors contribute only to camera blocks; compute
        # on shard 0 to avoid double counting under the psum
        r_e, J1, J2, w_e, c_ie = _inertial_linearize(pb)
        r_w, Jw1, Jw2, w_w, c_walk = _walk_linearize(pb)
        r_p, pr_inv_sigma, c_prior = _prior_linearize(pb)
        on0 = (shard_id == 0).astype(jnp.float32)
        for (rr, Ja, Jb, ww) in ((r_e, J1, J2, w_e * on0), (r_w, Jw1, Jw2, w_w * on0)):
            JaW = Ja * ww[:, None, None]
            JbW = Jb * ww[:, None, None]
            Hcc = Hcc.at[pb.ie_i, pb.ie_i].add(jnp.einsum("eik,eil->ekl", JaW, Ja))
            Hcc = Hcc.at[pb.ie_i, pb.ie_j].add(jnp.einsum("eik,eil->ekl", JaW, Jb))
            Hcc = Hcc.at[pb.ie_j, pb.ie_i].add(jnp.einsum("eik,eil->ekl", JbW, Ja))
            Hcc = Hcc.at[pb.ie_j, pb.ie_j].add(jnp.einsum("eik,eil->ekl", JbW, Jb))
            b_c = b_c.at[pb.ie_i].add(-jnp.einsum("eik,ei->ek", JaW, rr))
            b_c = b_c.at[pb.ie_j].add(-jnp.einsum("eik,ei->ek", JbW, rr))
        diag_idx = jnp.arange(K)
        pr_w2 = (pr_inv_sigma * pr_inv_sigma) * on0
        pr_full = jnp.zeros((K, 15), jnp.float32).at[:, 6:15].set(pr_w2)
        Hcc = Hcc.at[diag_idx, diag_idx].add(jax.vmap(jnp.diag)(pr_full))
        b_c = b_c.at[:, 6:15].add(-pr_inv_sigma * r_p * on0)

        # local landmark elimination
        Hll_d = Hll + 1e-6 * jnp.eye(3, dtype=jnp.float32)[None] \
            + lam * jax.vmap(jnp.diag)(jnp.maximum(jax.vmap(jnp.diagonal)(Hll), 1e-8))
        Hll_inv = inv3x3(Hll_d)
        Y_kp = jnp.einsum("kipv,pvw->kipw", W_kp, Hll_inv)
        Y2 = Y_kp.reshape(K * 15, Pl * 3)
        W2 = W_kp.reshape(K * 15, Pl * 3)
        # f32 MXU precision: the default bf16 matmul loses enough bits to
        # slow LM convergence measurably
        S_corr = jnp.matmul(Y2, W2.T, precision=jax.lax.Precision.HIGHEST
                            ).reshape(K, 15, K, 15).transpose(0, 2, 1, 3)
        b_corr = jnp.matmul(Y2, b_l.reshape(Pl * 3),
                            precision=jax.lax.Precision.HIGHEST).reshape(K, 15)

        # --- the distributed reduction: one psum over ICI ---
        S = jax.lax.psum(Hcc - S_corr, axis)
        b = jax.lax.psum(b_c - b_corr, axis)

        Sm = S.transpose(0, 2, 1, 3).reshape(K * 15, K * 15)
        diag = jnp.diagonal(Sm)
        Sm = Sm + jnp.diag(lam * jnp.maximum(diag, 1e-8))
        dof = pb.kf_dof.reshape(-1)
        Sm = Sm * dof[:, None] * dof[None, :] + jnp.diag(1.0 - dof)
        bm = b.reshape(-1) * dof
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-12))
        dx_c = (jnp.linalg.solve(Sm / d[:, None] / d[None, :], bm / d) / d).reshape(K, 15)

        # local landmark back-substitution
        acc = jnp.einsum("kipv,ki->pv", W_kp, dx_c)
        dx_l = jnp.einsum("pvw,pw->pv", Hll_inv, b_l - acc)
        # deferred-accept cost at the linearization point: visual part is
        # per-shard, camera-only terms live on shard 0 — one psum totals it
        cost_here = jax.lax.psum(
            c_vis + (c_ie + c_walk + c_prior) * on0, axis)
        return dx_c, dx_l, cost_here

    sharded_solve = shard_map(
        solve_once_local, mesh=mesh,
        in_specs=(in_specs, rep),
        out_specs=(rep, pt_spec, rep),
        check_rep=False,
    )

    # deferred-accept LM (see solver.schur_ba): the next iteration's
    # linearize validates the carried candidate; no per-iteration
    # replicated cost pass
    def body(carry, _):
        pb_best, cost_best, pb_cur, lam = carry
        dx_c, dx_l, cost_cur = sharded_solve(pb_cur, lam)
        improved = cost_cur <= cost_best
        pick = lambda a, b: jax.tree_util.tree_map(
            lambda n, o: jnp.where(improved, n, o) if n.dtype != jnp.bool_ else o,
            a, b)
        pb_base = pick(pb_cur, pb_best)
        cost_base = jnp.where(improved, cost_cur, cost_best)
        lam = jnp.where(cost_cur < cost_best, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.where(improved, lam, jnp.minimum(lam * 5.0, 1e6)))
        pb_next = pick(_retract_problem(pb_cur, dx_c, dx_l), pb_best)
        return (pb_base, cost_base, pb_next, lam), cost_base

    cost0 = _total_cost(problem, camera, R_cb, t_cb, huber_delta2)
    (pb, cost, pb_last, _), hist = jax.lax.scan(
        body, (problem, jnp.float32(jnp.inf), problem, jnp.float32(lambda0)),
        None, length=n_iters,
    )
    cost_last = _total_cost(pb_last, camera, R_cb, t_cb, huber_delta2)
    final_improved = cost_last < cost
    pb = jax.tree_util.tree_map(
        lambda n, o: jnp.where(final_improved, n, o) if n.dtype != jnp.bool_ else o,
        pb_last, pb,
    )
    cost = jnp.where(final_improved, cost_last, cost)
    return pb.kf, pb.points, {"cost0": cost0, "cost": cost, "cost_hist": hist}
