"""Pallas Hamming kernel must match the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from monoorbslam3_tpu.ops.matching import hamming_matrix
from monoorbslam3_tpu.ops.pallas_kernels import hamming_matrix_pallas

RNG = np.random.default_rng(41)


def test_pallas_hamming_matches_xla():
    a = RNG.integers(0, 2**32, (300, 8), dtype=np.uint32)  # non-multiple of tile
    b = RNG.integers(0, 2**32, (513, 8), dtype=np.uint32)
    ref = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(hamming_matrix_pallas(jnp.asarray(a), jnp.asarray(b),
                                           interpret=True))
    np.testing.assert_array_equal(got, ref)
