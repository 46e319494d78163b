"""Fused masked matching: gate + Hamming + top-2 in one formulation.

The original matching path (ops/matching.py) builds the [N, M] candidate
mask as a separate kernel and selects with top_k; this module fuses the
gate INTO the match (computed from per-side vectors on the fly) and
replaces top_k with min/argmin reductions XLA fuses into the matmul
consumer. Two interchangeable backends: the fused-XLA formulation (the
production path — 2.3x the old mask path on v5e) and a Pallas kernel of
the same algorithm (kept for experiments; measured SLOWER than fused XLA,
see the negative-result note in projected_match):

  per (row-tile, col-tile):
    d   = (256 - A_tile . B_tile^T) / 2          # +-1 bit-plane MXU matmul
    d   = INF where NOT [ valid & |uv_a - xy_b|^2 < r2_a & node_gate ]
    (best, second, argmin) running-merge into the output refs

Covers the tracker's three hot searches (projection-window, reference-KF /
SearchByBow, local-map) — the gates are the circular projection radius
(r2 = +inf degrades to no spatial gate) and the vocabulary node-id
equality with the -1 pass-through sentinel (ops/matching.py::node_gate).
Mutual consistency runs as a second, transposed call (best-only).

Tie-breaking matches the XLA path exactly (first occurrence), so
`projected_match` is bit-identical to mask-build + `match_descriptors`
(unit-tested, incl. interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_kernels import use_pallas

TN = 256
TM = 256
INF = 1e9


def _match_kernel(a_ref, bt_ref, ax_ref, ay_ref, r2a_ref, ga_ref, va_ref,
                  bx_ref, by_ref, r2b_ref, gb_ref, vb_ref,
                  best_ref, second_ref, idx_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    a = a_ref[:]          # [TN, 256] bf16 (+-1)
    bt = bt_ref[:]        # [256, TM] bf16 (+-1)
    dot = jnp.dot(a, bt, preferred_element_type=jnp.float32)
    d = (256.0 - dot) * 0.5  # [TN, TM] exact integer-valued f32

    # pairwise gate, computed on the fly (never materialized in HBM)
    dx = ax_ref[:] - bx_ref[:]          # [TN,1] - [1,TM] -> [TN, TM]
    dy = ay_ref[:] - by_ref[:]
    ga = ga_ref[:]
    gb = gb_ref[:]
    q = dx * dx + dy * dy
    gate = (va_ref[:] > 0.0) & (vb_ref[:] > 0.0)
    gate &= (q < r2a_ref[:]) & (q < r2b_ref[:])
    gate &= (ga == gb) | (ga < 0) | (gb < 0)
    d = jnp.where(gate, d, INF)

    # tile top-2 + first-occurrence argmin
    t1 = jnp.min(d, axis=1)             # [TN]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TN, TM), 1)
    ti_local = jnp.min(jnp.where(d == t1[:, None], lane, TM), axis=1)
    ti = ti_local + j * TM              # global column
    d2 = jnp.where(lane == ti_local[:, None], INF, d)
    t2 = jnp.min(d2, axis=1)

    @pl.when(j == 0)
    def _init():
        best_ref[:] = t1[:, None]
        second_ref[:] = t2[:, None]
        idx_ref[:] = jnp.where(t1 < INF, ti, -1)[:, None]

    @pl.when(j > 0)
    def _merge():
        b1 = best_ref[:, 0]
        b2 = second_ref[:, 0]
        bi = idx_ref[:, 0]
        take = t1 < b1  # ties keep the earlier (lower-index) tile
        best_ref[:] = jnp.where(take, t1, b1)[:, None]
        second_ref[:] = jnp.where(take, jnp.minimum(b1, t2),
                                  jnp.minimum(b2, t1))[:, None]
        idx_ref[:] = jnp.where(take, ti, bi)[:, None]
    del nj


def _unpack_pm1_bf16(desc):
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256).astype(jnp.bfloat16)
    return 2.0 * bits - 1.0


@partial(jax.jit, static_argnames=("interpret",))
def _match_rows_pallas(desc_a, desc_b, ax, ay, r2a, ga, va,
                       bx, by, r2b, gb, vb, interpret=False):
    """Row-side stats: (best [N] f32, second [N] f32, idx [N] i32)."""
    N, M = desc_a.shape[0], desc_b.shape[0]
    n_pad = (-N) % TN
    m_pad = (-M) % TM

    A = _unpack_pm1_bf16(jnp.pad(desc_a, ((0, n_pad), (0, 0))))
    BT = _unpack_pm1_bf16(jnp.pad(desc_b, ((0, m_pad), (0, 0)))).T

    def prow(x, fill=0.0):
        return jnp.pad(jnp.asarray(x, jnp.float32), (0, n_pad),
                       constant_values=fill)[:, None]

    def pcol(x, fill=0.0):
        return jnp.pad(jnp.asarray(x, jnp.float32), (0, m_pad),
                       constant_values=fill)[None, :]

    Np, Mp = N + n_pad, M + m_pad
    row = lambda i, j: (i, 0)
    col = lambda i, j: (0, j)
    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=(Np // TN, Mp // TM),
        in_specs=[
            pl.BlockSpec((TN, 256), row),
            pl.BlockSpec((256, TM), col),
            pl.BlockSpec((TN, 1), row), pl.BlockSpec((TN, 1), row),
            pl.BlockSpec((TN, 1), row), pl.BlockSpec((TN, 1), row),
            pl.BlockSpec((TN, 1), row),
            pl.BlockSpec((1, TM), col), pl.BlockSpec((1, TM), col),
            pl.BlockSpec((1, TM), col), pl.BlockSpec((1, TM), col),
            pl.BlockSpec((1, TM), col),
        ],
        out_specs=[
            pl.BlockSpec((TN, 1), row),
            pl.BlockSpec((TN, 1), row),
            pl.BlockSpec((TN, 1), row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ],
        interpret=interpret,
    )(A, BT, prow(ax), prow(ay), prow(r2a), prow(ga, -1.0), prow(va),
      pcol(bx), pcol(by), pcol(r2b), pcol(gb, -1.0), pcol(vb))
    return best[:N, 0], second[:N, 0], idx[:N, 0]


def _match_rows_xla(desc_a, desc_b, ax, ay, r2a, ga, va, bx, by, r2b, gb, vb):
    """Reference/fallback with identical tie-breaking (first occurrence)."""
    from . import matching

    d = matching.hamming_matrix(desc_a, desc_b).astype(jnp.float32)
    dx = ax[:, None] - bx[None, :]
    dy = ay[:, None] - by[None, :]
    q = dx * dx + dy * dy
    gate = (va[:, None] > 0) & (vb[None, :] > 0)
    gate &= (q < r2a[:, None]) & (q < r2b[None, :])
    gate &= matching.node_gate(ga, gb)
    d = jnp.where(gate, d, INF)
    best = jnp.min(d, axis=1)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(lane == idx[:, None], INF, d)
    second = jnp.min(d2, axis=1)
    idx = jnp.where(best < INF, idx, -1)
    return best, second, idx


_match_rows_xla_jit = jax.jit(_match_rows_xla)


@partial(jax.jit, static_argnames=("mutual", "use_ratio", "backend"))
def _projected_match_impl(desc_a, desc_b, ax, ay, r2, ga, va, bx, by, gb, vb,
                          max_dist, ratio, mutual, use_ratio, backend):
    if backend == "pallas":
        rows = partial(_match_rows_pallas, interpret=False)
    elif backend == "interpret":
        rows = partial(_match_rows_pallas, interpret=True)
    else:
        rows = _match_rows_xla
    infc = jnp.full_like(bx, INF)
    best, second, idx = rows(desc_a, desc_b, ax, ay, r2, ga, va,
                             bx, by, infc, gb, vb)
    ok = (idx >= 0) & (best <= max_dist)
    if use_ratio:
        ok &= best < ratio * second
    if mutual:
        # transposed pass (column-wise first-occurrence argmin) under the
        # SAME pairwise gate: the radius rides on the now-column side
        _, _, idx_b = rows(desc_b, desc_a, bx, by, infc, gb, vb,
                           ax, ay, r2, ga, va)
        safe = jnp.maximum(idx, 0)
        ok &= idx_b[safe] == jnp.arange(desc_a.shape[0])
    out_idx = jnp.where(ok, idx, -1)
    big = jnp.float32(1 << 20)
    return out_idx, jnp.where(ok, best, big).astype(jnp.int32)


def projected_match(desc_a, desc_b, *, uv_a=None, xy_b=None, radius=None,
                    groups_a=None, groups_b=None, valid_a, valid_b,
                    max_dist, ratio=0.9, mutual=True, use_ratio=True,
                    backend=None):
    """Fused analog of projection_mask/node_gate + match_descriptors.

    radius: per-row search radius (None = no spatial gate); groups: vocab
    node ids with -1 pass-through. Returns (idx [N] i32, dist [N] i32)
    exactly like match_descriptors. backend: None (auto), "pallas",
    "interpret", "xla".
    """
    N, M = desc_a.shape[0], desc_b.shape[0]
    z = jnp.zeros
    ax, ay = ((uv_a[:, 0], uv_a[:, 1]) if uv_a is not None
              else (z(N, jnp.float32), z(N, jnp.float32)))
    bx, by = ((xy_b[:, 0], xy_b[:, 1]) if xy_b is not None
              else (z(M, jnp.float32), z(M, jnp.float32)))
    r2 = (jnp.asarray(radius, jnp.float32) ** 2 if radius is not None
          else jnp.full(N, INF, jnp.float32))
    ga = (jnp.asarray(groups_a, jnp.float32) if groups_a is not None
          else jnp.full(N, -1.0, jnp.float32))
    gb = (jnp.asarray(groups_b, jnp.float32) if groups_b is not None
          else jnp.full(M, -1.0, jnp.float32))
    if backend is None:
        # NEGATIVE RESULT (2026-08-18, v5e): the Mosaic kernel measures
        # 167 us rt / 2631 us bulk vs the fused-XLA formulation's
        # 109 / 1756 us — XLA:TPU already fuses the gate + min/argmin
        # epilogue into the matmul consumer, and Mosaic's per-tile
        # overhead + the separate transposed pass lose to it. The fused
        # formulation itself is the win: 2.3x over the old
        # mask-materializing path (255 us). Pallas path kept for
        # experiments ("pallas"/"interpret").
        backend = "xla"
    return _projected_match_impl(
        jnp.asarray(desc_a), jnp.asarray(desc_b),
        jnp.asarray(ax, jnp.float32), jnp.asarray(ay, jnp.float32), r2,
        ga, jnp.asarray(valid_a, jnp.float32),
        jnp.asarray(bx, jnp.float32), jnp.asarray(by, jnp.float32), gb,
        jnp.asarray(valid_b, jnp.float32),
        jnp.asarray(max_dist, jnp.float32), jnp.asarray(ratio, jnp.float32),
        mutual, use_ratio, backend)
