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


def test_pallas_chol_solve_matches_numpy():
    """Single-kernel Cholesky factor+solve vs f64 numpy, incl. a
    non-multiple-of-8 dimension (identity-padded)."""
    from monoorbslam3_tpu.ops.chol_pallas import chol_solve_pallas

    for D in (12, 96, 480):
        A = RNG.normal(size=(D, D)).astype(np.float32)
        S = A @ A.T + D * np.eye(D, dtype=np.float32)
        b = RNG.normal(size=D).astype(np.float32)
        x = np.asarray(chol_solve_pallas(jnp.asarray(S), jnp.asarray(b),
                                         interpret=True))
        x_ref = np.linalg.solve(S.astype(np.float64), b.astype(np.float64))
        err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
        assert err < 1e-5, f"D={D}: rel err {err:.2e}"
