"""Microbench: reduced-camera solve — Cholesky vs preconditioned CG.

Builds the REAL reduced system from the bench window (one linearize of the
bench BAProblem), then times (a) the Jacobi+Cholesky solve, (b) Jacobi-PCG
at several iteration budgets, inside one jitted scan each. Also reports
solution error vs an f64 host solve.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from monoorbslam3_tpu.backend import solver as S

problem, cam = build_problem()
R_cb = jnp.eye(3)
t_cb = jnp.zeros(3)
K = problem.kf_dof.shape[0]


@jax.jit
def get_system(pb):
    with jax.default_matmul_precision("highest"):
        Sm, bm, *_ = S.schur_ba.__wrapped__.__wrapped__ if False else (None,)
    return None

# call the internal assemble directly (not exported via jit wrapper)
from monoorbslam3_tpu.utils.precision import f32_matmuls


@jax.jit
@f32_matmuls
def assemble(pb):
    # replicate the hoisted one-hots + linearize_assemble closure by calling
    # schur_ba internals is awkward; instead rebuild the reduced system the
    # same way via a 1-iter schur_ba is not possible. So: cheap reimpl using
    # the module's building blocks.
    import functools
    P = pb.points.shape[0]
    Ek = (pb.obs_kf[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
    Ep = (pb.obs_pt[:, None] == jnp.arange(P)[None, :]).astype(jnp.float32)
    _mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGH)
    from monoorbslam3_tpu.backend import residuals as res

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
    return Sm, bm


Sm, bm = assemble(problem)
Sm.block_until_ready()
Sm_np = np.asarray(Sm, np.float64)
bm_np = np.asarray(bm, np.float64)
lam = 1e-4
Sd_np = Sm_np + np.diag(lam * np.maximum(np.diag(Sm_np), 1e-8))
x_ref = np.linalg.solve(Sd_np, bm_np)


def chol_solve(Sm, bm, lam):
    return S.solve_reduced_like(Sm, bm, lam) if hasattr(S, "solve_reduced_like") else None


@jax.jit
def chol(Sm, bm, lam):
    Sd = Sm + jnp.diag(lam * jnp.maximum(jnp.diagonal(Sm), 1e-8))
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(Sd), 1e-12))
    Sd_n = Sd / d[:, None] / d[None, :]
    L = jnp.linalg.cholesky(Sd_n)
    return jax.scipy.linalg.cho_solve((L, True), bm / d) / d


def make_pcg(n_cg):
    @jax.jit
    def pcg(Sm, bm, lam):
        with jax.default_matmul_precision("highest"):
            Sd = Sm + jnp.diag(lam * jnp.maximum(jnp.diagonal(Sm), 1e-8))
            d = jnp.sqrt(jnp.maximum(jnp.diagonal(Sd), 1e-12))
            A = Sd / d[:, None] / d[None, :]
            b = bm / d
            # Jacobi-normalized => precond = I
            x = jnp.zeros_like(b)
            r = b
            p = r
            rs = r @ r

            def body(carry, _):
                x, r, p, rs = carry
                Ap = A @ p
                alpha = rs / jnp.maximum(p @ Ap, 1e-30)
                x = x + alpha * p
                r = r - alpha * Ap
                rs_new = r @ r
                p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
                return (x, r, p, rs_new), None

            (x, r, p, rs), _ = jax.lax.scan(body, (x, r, p, rs), None, length=n_cg)
            return x / d
    return pcg


def scan_time(fn, *args, reps=200):
    @jax.jit
    def run():
        def body(acc, _):
            out = fn(args[0] + acc * 1e-30, *args[1:])
            return acc + out[0] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc
    out = run(); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


x_chol = np.asarray(chol(Sm, bm, lam), np.float64)
err_chol = np.linalg.norm(x_chol - x_ref) / np.linalg.norm(x_ref)
t_chol = scan_time(chol, Sm, bm, lam)
print(f"chol: {t_chol*1e3:.0f} us  relerr {err_chol:.2e}", flush=True)

for n_cg in (16, 32, 64, 128):
    pcg = make_pcg(n_cg)
    x = np.asarray(pcg(Sm, bm, lam), np.float64)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    t = scan_time(pcg, Sm, bm, lam)
    print(f"pcg{n_cg}: {t*1e3:.0f} us  relerr {err:.2e}", flush=True)
