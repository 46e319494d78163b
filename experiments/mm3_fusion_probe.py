"""Dispatch-cost probe for the BA plateau (VERDICT r03 item #5).

The schur_ba inertial linearize is a chain of ~10-15 batched [E,3,3]
matmuls at E~32 — each a separate dot_general kernel whose cost is pure
dispatch latency (~10-40 us), not FLOPs. Hypothesis: expressing a 3x3
matmul as an UNROLLED elementwise contraction (mul + add over the
size-3 axis) lets XLA fuse an entire dependency chain into one or two
VPU kernels, collapsing the dispatch count.

Measures (scan-amortized): a depth-D chain of [E,3,3] products via
  a) einsum dot_general           (the current form)
  b) unrolled broadcast-multiply  (sum over k of A[...,k][...,None]*B[k])
at E in {32, 96} and D in {4, 12}.

Run on the real chip: python experiments/mm3_fusion_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time_ms(stage_fn, reps=300, tries=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def body(acc, _):
            out = stage_fn(acc * 1e-20)
            return acc + out.ravel()[0].astype(jnp.float32) * 1e-30, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    jax.block_until_ready(run())
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def mm3_einsum(A, B):
    import jax.numpy as jnp

    return jnp.einsum("eij,ejk->eik", A, B)


def mm3_unrolled(A, B):
    # sum_k A[..., :, k, None] * B[..., None, k, :] with the k-loop
    # unrolled in python: three fused multiply-adds, no dot_general
    return (A[..., :, 0, None] * B[..., None, 0, :]
            + A[..., :, 1, None] * B[..., None, 1, :]
            + A[..., :, 2, None] * B[..., None, 2, :])


def main():
    import jax
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0])}
    rng = np.random.default_rng(0)
    for E in (32, 96):
        A0 = jnp.asarray(rng.normal(size=(E, 3, 3)).astype(np.float32))
        for D in (4, 12):
            for label, mm in (("einsum", mm3_einsum),
                              ("unrolled", mm3_unrolled)):
                def chain(eps, mm=mm, A0=A0, D=D):
                    X = A0 + eps
                    for _ in range(D):
                        X = mm(X, A0)
                    return X

                ms = scan_time_ms(chain)
                out[f"E{E}_D{D}_{label}_ms"] = round(ms, 5)
                # numerical parity
            x1 = np.asarray(chain(jnp.float32(0.0), mm3_einsum, A0, D))
            x2 = np.asarray(chain(jnp.float32(0.0), mm3_unrolled, A0, D))
            out[f"E{E}_D{D}_maxdiff"] = float(np.abs(x1 - x2).max())
    print(json.dumps(out, indent=1))
    with open("/tmp/mm3_fusion_probe.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
