"""f32 matmul scoping for accuracy-critical geometry code.

On TPU the DEFAULT matmul/einsum precision is bf16 (with f32
accumulation). That is correct for the throughput kernels that opt into
it (the ±1 bit-plane Hamming matmul is exact in bf16; image-pyramid
convolutions are noise-tolerant), but it silently corrupts geometry: a
camera projection is ~O(300 px), so bf16's ~0.4% relative error is ~1 px
of noise on residuals whose real magnitude is ~0.3 px. Measured effect
(2026-08-17, v5e): schur_ba on the bench window converged to cost 21654
under DEFAULT precision vs 1118 with f32 matmuls — a 20x-worse optimum —
and the LM accept logic went non-monotone because two differently-fused
evaluations of the SAME state disagreed by 17%.

`f32_matmuls` wraps a traced function so every matmul/einsum/conv created
inside defaults to Precision.HIGHEST (true f32). Explicitly-annotated
precisions inside the scope are unaffected, so deliberate bf16 kernels
keep their speed. Apply it UNDER jax.jit (the context must be active at
trace time)."""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
