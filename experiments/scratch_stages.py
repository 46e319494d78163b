"""Stage timing of one schur_ba iteration on the bench problem."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

from bench import build_problem
from monoorbslam3_tpu.backend import solver as S
from monoorbslam3_tpu.backend import residuals as res
from monoorbslam3_tpu.utils.precision import f32_matmuls

problem, cam = build_problem()
R_cb = jnp.eye(3)
t_cb = jnp.zeros(3)
K = problem.kf_dof.shape[0]
P = problem.points.shape[0]

Ek_np = (np.asarray(problem.obs_kf)[:, None] == np.arange(K)[None, :]).astype(np.float32)
Ep_np = (np.asarray(problem.obs_pt)[:, None] == np.arange(P)[None, :]).astype(np.float32)
Ek = jnp.asarray(Ek_np)
Ep = jnp.asarray(Ep_np)
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGH)


@f32_matmuls
def assemble(pb):
    r_v, Jc, Jl, w_v, chi2_v, c_vis = S._vis_linearize(pb, cam, R_cb, t_cb, S.CHI2_MONO)
    r_e, J1, J2, w_e, c_ie = S._inertial_linearize(pb)
    r_w, Jw1, Jw2, w_w, c_walk = S._walk_linearize(pb)
    r_p, pr_inv_sigma, c_prior = S._prior_linearize(pb)
    O = r_v.shape[0]
    Ja = jnp.concatenate([Jc, Jl, -r_v[:, :, None]], -1)
    B = jnp.einsum("oik,oil->okl", Ja * w_v[:, None, None], Ja)
    W_o = B[:, :6, 6:9]
    cols = jnp.concatenate([
        B[:, :6, :6].reshape(O, 36), B[:, :6, 9:10].reshape(O, 6),
        B[:, 6:9, 6:9].reshape(O, 9), B[:, 6:9, 9:10].reshape(O, 3),
        (Ek[:, :, None] * W_o.reshape(O, 1, 18)).reshape(O, K * 18),
    ], -1)
    SUM = _mm(jnp.concatenate([Ek, Ep], 1).T, cols)
    camk = SUM[:K, :42]
    Hcc = jnp.zeros((K, K, 15, 15), jnp.float32)
    di = jnp.arange(K)
    Hcc = Hcc.at[di, di, :6, :6].add(camk[:, :36].reshape(K, 6, 6))
    b_c = jnp.zeros((K, 15), jnp.float32).at[:, :6].set(camk[:, 36:])
    Hll = SUM[K:, 42:51].reshape(P, 3, 3)
    b_l = SUM[K:, 51:54]
    W_p = SUM[K:, 54:].reshape(P, K * 6, 3)
    Hcc, b_c = S._scatter_edge_blocks(Hcc, b_c, pb.ie_i, pb.ie_j,
                                      ((r_e, J1, J2, w_e), (r_w, Jw1, Jw2, w_w)))
    pr_w2 = pr_inv_sigma * pr_inv_sigma
    pr_full = jnp.zeros((K, 15), jnp.float32).at[:, 6:15].set(pr_w2)
    Hcc = Hcc.at[di, di].add(jax.vmap(jnp.diag)(pr_full))
    b_c = b_c.at[:, 6:15].add(-pr_inv_sigma * r_p)
    Hll_d = Hll + 1e-6 * jnp.eye(3, dtype=jnp.float32)[None] \
        + 1e-3 * jax.vmap(jnp.diag)(jnp.maximum(jax.vmap(jnp.diagonal)(Hll), 1e-8))
    Hll_inv = S.inv3x3(Hll_d)
    Y_p = jnp.einsum("pkv,pvw->pkw", W_p, Hll_inv)
    S6 = jax.lax.dot_general(Y_p, W_p, (((0, 2), (0, 2)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    b6 = jnp.einsum("pkv,pv->k", Y_p, b_l)
    Sfull = Hcc.at[:, :, :6, :6].add(-S6.reshape(K, 6, K, 6).transpose(0, 2, 1, 3))
    b = b_c.at[:, :6].add(-b6.reshape(K, 6))
    Sm = Sfull.transpose(0, 2, 1, 3).reshape(K * 15, K * 15)
    dof = pb.kf_dof.reshape(-1)
    Sm = Sm * dof[:, None] * dof[None, :] + jnp.diag(1.0 - dof)
    bm = b.reshape(-1) * dof
    return Sm, bm, W_p, Hll_inv, b_l


@f32_matmuls
def vis_only(pb):
    r_v, Jc, Jl, w_v, chi2_v, c_vis = S._vis_linearize(pb, cam, R_cb, t_cb, S.CHI2_MONO)
    return (r_v * w_v[:, None]).sum() + Jc.sum() + Jl.sum()


@f32_matmuls
def sum_only(pb):
    r_v, Jc, Jl, w_v, chi2_v, c_vis = S._vis_linearize(pb, cam, R_cb, t_cb, S.CHI2_MONO)
    O = r_v.shape[0]
    Ja = jnp.concatenate([Jc, Jl, -r_v[:, :, None]], -1)
    B = jnp.einsum("oik,oil->okl", Ja * w_v[:, None, None], Ja)
    W_o = B[:, :6, 6:9]
    cols = jnp.concatenate([
        B[:, :6, :6].reshape(O, 36), B[:, :6, 9:10].reshape(O, 6),
        B[:, 6:9, 6:9].reshape(O, 9), B[:, 6:9, 9:10].reshape(O, 3),
        (Ek[:, :, None] * W_o.reshape(O, 1, 18)).reshape(O, K * 18),
    ], -1)
    SUM = _mm(jnp.concatenate([Ek, Ep], 1).T, cols)
    return SUM.sum()


@f32_matmuls
def schur_tail(pb):
    Sm, bm, W_p, Hll_inv, b_l = assemble(pb)
    return Sm.sum() + bm.sum()


def scan_time(fn, reps=200, red=lambda o: o if o.ndim == 0 else o.ravel()[0]):
    @jax.jit
    def run():
        def body(acc, _):
            pb = problem._replace(points=problem.points + acc * 1e-30)
            out = fn(pb)
            out = out[0] if isinstance(out, tuple) else out
            return acc + out.ravel()[0].astype(jnp.float32) * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc
    out = run(); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


print(f"vis_linearize:  {scan_time(vis_only)*1e3:.0f} us", flush=True)
print(f"vis+B+SUM:      {scan_time(sum_only)*1e3:.0f} us", flush=True)
print(f"full assemble:  {scan_time(assemble)*1e3:.0f} us", flush=True)
