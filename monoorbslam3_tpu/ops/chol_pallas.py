"""Single-kernel Pallas Cholesky solve — a MEASURED NEGATIVE RESULT.

Status (2026-08-17, v5e, D=480, G=2 batched): this kernel solves in
1.23 ms vs lax Cholesky + cho_solve at 0.91 ms — it is NOT wired into
the BA solver. It is kept (with its correctness test) as the documented
floor experiment: a correct single-launch blocked factor+solve whose
~1500 sequential masked micro-steps cost ~0.7 us each in Mosaic even
fully unrolled, so beating XLA's own depth-linear panel recursion needs
either much wider panels with in-kernel MXU triangular solves or a
fundamentally different (iterative) method. See STATUS.md floor notes;
the earlier "reduced Cholesky ~1.4-2.0 ms" estimate over-attributed the
iteration cost — the batched lax solve measures 0.91 ms at G=2.

Algorithm (all shapes static, D padded to a multiple of 8):
- blocked right-looking Cholesky with 8-row panels: each outer step
  factors an aligned [8, D] row block in 8 masked micro-steps (rows are
  selected by one-hot sums — TPU dynamic row indexing must be 8-aligned),
  writes the block into the L output (row k of `L` = column k of the
  mathematical Cholesky factor, zeroed left of the diagonal), then
  applies the rank-8 trailing update as ONE [D, 8] @ [8, D] MXU matmul.
- forward/backward substitution in the same 8-row-block style: the
  stored row k is exactly the k-th column of L (forward) and the k-th
  row of L^T (backward).

`chol_solve` transparently falls back to lax Cholesky off-TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import use_pallas


def _chol_solve_kernel(S_ref, b_ref, x_ref, U_ref, L_ref, y_ref):
    D = S_ref.shape[0]
    U_ref[:] = S_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)  # [1, D] col index
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)  # [8, 1] row-in-block

    # ---- factorization ------------------------------------------------
    def factor_block(blk, _):
        k8 = blk * 8
        B = U_ref[pl.ds(k8, 8), :]  # aligned 8-row block (live rows)

        # statically unrolled 8-step panel factorization (a fori_loop here
        # costs ~0.5 us/iteration of Mosaic loop overhead x 512 steps —
        # measured to LOSE to lax; straight-line code wins)
        Lblk = jnp.zeros_like(B)
        for r in range(8):
            k = k8 + r
            onerow = (sub == r).astype(jnp.float32)  # [8, 1]
            row = jnp.sum(B * onerow, axis=0, keepdims=True)  # [1, D]
            dk2 = jnp.sum(jnp.where(col == k, row, 0.0))
            inv_d = jax.lax.rsqrt(jnp.maximum(dk2, 1e-30))
            lrow = jnp.where(col >= k, row * inv_d, 0.0)  # [1, D]
            # rank-1 update of the remaining rows in this block:
            # B[i, :] -= l[k8+i] * lrow  for rows i > r
            # ([8, D] one-hot row mask selects lrow at columns k8+0..7)
            li = jnp.sum(jnp.where(col == (k8 + sub), lrow, 0.0),
                         axis=1, keepdims=True)  # [8, 1]
            B = B - (li * (sub > r).astype(jnp.float32)) * lrow
            Lblk = Lblk + onerow * lrow
        L_ref[pl.ds(k8, 8), :] = Lblk
        # rank-8 trailing update (also touches dead rows; they are never
        # read again)
        U_ref[:] = U_ref[:] - jax.lax.dot_general(
            Lblk, Lblk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, D // 8, factor_block, 0)

    # ---- forward substitution: L y = b (column access via L rows) -----
    y_ref[:] = b_ref[:]  # [1, D]

    def fwd_block(blk, _):
        k8 = blk * 8
        Lb = L_ref[pl.ds(k8, 8), :]
        y = y_ref[:]
        for r in range(8):  # statically unrolled
            k = k8 + r
            onerow = (sub == r).astype(jnp.float32)
            lrow = jnp.sum(Lb * onerow, axis=0, keepdims=True)  # [1, D]
            bk = jnp.sum(jnp.where(col == k, y, 0.0))
            dk = jnp.sum(jnp.where(col == k, lrow, 0.0))
            yk = bk / dk
            # eliminate variable k from later equations; entry k itself
            # becomes the solved y_k
            y = jnp.where(col == k, yk, y - yk * lrow)
        y_ref[:] = y
        return 0

    jax.lax.fori_loop(0, D // 8, fwd_block, 0)

    # ---- backward substitution: L^T x = y (L rows ARE L^T rows) -------
    x_ref[:] = jnp.zeros_like(x_ref)

    def bwd_block(blk_rev, _):
        k8 = (D // 8 - 1 - blk_rev) * 8
        Lb = L_ref[pl.ds(k8, 8), :]
        x = x_ref[:]
        y = y_ref[:]
        for rr in range(8):  # statically unrolled
            r = 7 - rr
            k = k8 + r
            onerow = (sub == r).astype(jnp.float32)
            lrow = jnp.sum(Lb * onerow, axis=0, keepdims=True)
            s = jnp.sum(jnp.where(col > k, lrow * x, 0.0))
            yk = jnp.sum(jnp.where(col == k, y, 0.0))
            dk = jnp.sum(jnp.where(col == k, lrow, 0.0))
            x = jnp.where(col == k, (yk - s) / dk, x)
        x_ref[:] = x
        return 0

    jax.lax.fori_loop(0, D // 8, bwd_block, 0)


@partial(jax.jit, static_argnames=("interpret",))
def chol_solve_pallas(S: jnp.ndarray, b: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Solve S x = b for SPD S [D, D] (single system). Pads D to 8.

    Padding uses an identity diagonal so the factorization stays SPD.
    """
    D = S.shape[0]
    pad = (-D) % 8
    Dp = D + pad
    if pad:
        S = jnp.pad(S, ((0, pad), (0, pad)))
        S = S.at[jnp.arange(D, Dp), jnp.arange(D, Dp)].set(1.0)
        b = jnp.pad(b, (0, pad))
    x = pl.pallas_call(
        _chol_solve_kernel,
        out_shape=jax.ShapeDtypeStruct((1, Dp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Dp, Dp), jnp.float32),
            pltpu.VMEM((Dp, Dp), jnp.float32),
            pltpu.VMEM((1, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(S.astype(jnp.float32), b.astype(jnp.float32).reshape(1, Dp))
    return x.reshape(Dp)[:D]


def chol_solve(S: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """SPD solve: Pallas single-kernel on TPU, lax Cholesky elsewhere."""
    if use_pallas():
        return chol_solve_pallas(S, b)
    L = jnp.linalg.cholesky(S)
    return jax.scipy.linalg.cho_solve((L, True), b)
