"""A/B: current _inertial_linearize vs consolidated v2 (fewer dispatches).

Checks numerical agreement on the bench problem and scan-times both.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from monoorbslam3_tpu.backend import solver as S
from monoorbslam3_tpu.backend import residuals as res
from monoorbslam3_tpu.utils import lie
from monoorbslam3_tpu.utils.precision import f32_matmuls

problem, cam = build_problem()
# give the edges real content so the rotation chain is exercised
rng = np.random.default_rng(1)
E = problem.ie_i.shape[0]
e = problem.ie_edge
dR = np.stack([np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))
               for w in rng.normal(0, 0.1, (E, 3)).astype(np.float32)])
e = e._replace(
    dR=jnp.asarray(dR),
    dV=jnp.asarray(rng.normal(0, 0.3, (E, 3)).astype(np.float32)),
    dP=jnp.asarray(rng.normal(0, 0.2, (E, 3)).astype(np.float32)),
    JRg=jnp.asarray(rng.normal(0, 0.2, (E, 3, 3)).astype(np.float32)),
    JVg=jnp.asarray(rng.normal(0, 0.2, (E, 3, 3)).astype(np.float32)),
    JVa=jnp.asarray(rng.normal(0, 0.2, (E, 3, 3)).astype(np.float32)),
    JPg=jnp.asarray(rng.normal(0, 0.2, (E, 3, 3)).astype(np.float32)),
    JPa=jnp.asarray(rng.normal(0, 0.2, (E, 3, 3)).astype(np.float32)),
    bg0=jnp.asarray(rng.normal(0, 0.01, (E, 3)).astype(np.float32)),
    ba0=jnp.asarray(rng.normal(0, 0.05, (E, 3)).astype(np.float32)),
)
problem = problem._replace(ie_edge=e)

# placement one-hots for the block assembly (numpy: baked into HLO)
# blocks n -> (block-row r in 0..2, block-col c in 0..9) of [9, 30] = [J1|J2]
_BLOCK_POS = [
    # J1 (cols 0..4): [phi, dt, dv, dbg, dba]
    (0, 0),  # mijR21
    (0, 3),  # der_dbg
    (1, 0),  # hat(ev_arg)
    (1, 2),  # -Rb1w
    (1, 3),  # -JVg
    (1, 4),  # -JVa
    (2, 0),  # hat(ep_arg)
    (2, 1),  # -I
    (2, 2),  # -Rb1w*dt
    (2, 3),  # -JPg
    (2, 4),  # -JPa
    # J2 (cols 5..9)
    (0, 5),  # invJr
    (1, 7),  # Rb1w
    (2, 6),  # M
]
_NB = len(_BLOCK_POS)
_ROW1H = np.zeros((_NB, 3), np.float32)
_COL1H = np.zeros((_NB, 10), np.float32)
for n, (r, c) in enumerate(_BLOCK_POS):
    _ROW1H[n, r] = 1.0
    _COL1H[n, c] = 1.0


@f32_matmuls
def inertial_linearize_v2(problem):
    s1 = S._gather_kf(problem.kf, problem.ie_i)
    s2 = S._gather_kf(problem.kf, problem.ie_j)
    e = problem.ie_edge
    E = problem.ie_i.shape[0]

    dbg = s1.bg - e.bg0
    dba = s1.ba - e.ba0
    Rb1w = jnp.swapaxes(s1.R_wb, -1, -2)
    dt = e.dt[..., None]

    dv_w = s2.v - s1.v - res.G_I * dt
    dp_w = s2.t_wb - s1.t_wb - s1.v * dt - 0.5 * res.G_I * dt * dt
    mats = jnp.stack([e.JRg, e.JVg, e.JVa, e.JPg, e.JPa, Rb1w, Rb1w], 1)
    vecs = jnp.stack([dbg, dbg, dba, dbg, dba, dv_w, dp_w], 1)
    mv = jnp.einsum("ecij,ecj->eci", mats, vecs)
    jrg_dbg = mv[:, 0]
    dV = e.dV + mv[:, 1] + mv[:, 2]
    dP = e.dP + mv[:, 3] + mv[:, 4]
    ev_arg, ep_arg = mv[:, 5], mv[:, 6]

    # rotation chain, stacked at each dependency level:
    # N = dR^T Rb1w (inputs only)
    N = jnp.swapaxes(e.dR, -1, -2) @ Rb1w
    Exp = lie.exp_so3(jrg_dbg)
    Jr = lie.right_jacobian_so3(jrg_dbg)
    # level 1: {T1 = N R2, P = Jr JRg}
    l1 = jnp.einsum("ecij,ecjk->ecik",
                    jnp.stack([N, Jr], 1), jnp.stack([s2.R_wb, e.JRg], 1))
    T1, P = l1[:, 0], l1[:, 1]
    # level 2 (shared rhs T1): {eR = Exp^T T1, M = dR T1}
    l2 = jnp.einsum("ecij,ejk->ecik",
                    jnp.stack([jnp.swapaxes(Exp, -1, -2), e.dR], 1), T1)
    eR, M = l2[:, 0], l2[:, 1]
    er = lie.log_so3(eR)
    ev = ev_arg - dV
    ep = ep_arg - dP
    invJr = lie.inv_right_jacobian_so3(er)
    U = invJr @ jnp.swapaxes(eR, -1, -2)
    # level 4: {der_dbg = -U P, mijR21 = -invJr M^T}
    l4 = jnp.einsum("ecij,ecjk->ecik",
                    jnp.stack([-U, -invJr], 1),
                    jnp.stack([P, jnp.swapaxes(M, -1, -2)], 1))
    der_dbg, mijR21 = l4[:, 0], l4[:, 1]

    hats = lie.hat(jnp.stack([ev_arg, ep_arg], 1))  # [E, 2, 3, 3]
    eye3 = np.eye(3, dtype=np.float32)
    blocks = jnp.stack([
        mijR21, der_dbg,
        hats[:, 0], -Rb1w, -e.JVg, -e.JVa,
        hats[:, 1], jnp.broadcast_to(-eye3, (E, 3, 3)),
        -Rb1w * dt[..., None], -e.JPg, -e.JPa,
        invJr, Rb1w, M,
    ], 0)  # [NB, E, 3, 3]
    # placement: J[e, 3r+i, 3c+j] = sum_n PL[n,r,c] blocks[n,e,i,j] — one
    # contraction with a combined [NB, 3, 10] one-hot placement tensor
    PL = (_ROW1H[:, :, None] * _COL1H[:, None, :])  # [NB, 3, 10]
    J = jnp.einsum("neij,nrc->ericj", blocks, PL).reshape(E, 9, 30)

    r9 = jnp.concatenate([er, ev, ep], -1)
    W = e.L_inv @ jnp.concatenate([r9[..., None], J], -1)
    r0, J1, J2 = W[..., 0], W[..., 1:16], W[..., 16:31]

    w = problem.ie_valid.astype(jnp.float32)
    cost = jnp.sum(w * jnp.sum(r0 * r0, axis=-1))
    return r0, J1, J2, w, cost


f_old = jax.jit(S._inertial_linearize)
f_new = jax.jit(inertial_linearize_v2)

o = f_old(problem)
n = f_new(problem)
for a, b, name in zip(o, n, ["r0", "J1", "J2", "w", "cost"]):
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"{name}: max|diff| {d:.3e}", flush=True)


def scan_time(fn, reps=300):
    @jax.jit
    def run():
        def body(acc, _):
            pb = problem._replace(points=problem.points + acc * 1e-30)
            out = fn(pb)
            return acc + out[4] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc
    out = run(); jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


print(f"old: {scan_time(S._inertial_linearize)*1e3:.0f} us", flush=True)
print(f"new: {scan_time(inertial_linearize_v2)*1e3:.0f} us", flush=True)
