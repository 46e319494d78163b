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


def hamming_matrix_best(desc_a, desc_b):
    """Pallas on TPU, XLA elsewhere."""
    if use_pallas():
        return hamming_matrix_pallas(desc_a, desc_b)
    from . import matching

    return matching.hamming_matrix(desc_a, desc_b)
