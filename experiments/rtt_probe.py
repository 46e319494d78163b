"""Tunnel dispatch-cost model probe (round 5, VERDICT item 3).

Measures, on the real TPU through the tunnel, what actually costs a
round trip: device_put count, jit arg count, blocking reads, donation.
Drives the design of the dispatch-reduction work: if N device_puts cost
N RTTs, problem assembly must pack host data into few buffers; if a
single jit call with numpy args pipelines its transfers, passing numpy
leaves directly is enough.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, reps=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    if out is not None:
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # 0. raw RTT: tiny transfer + read back
    x = np.ones(8, np.float32)

    def rtt():
        return np.asarray(jax.device_put(x, dev))
    print(f"raw put+read: {timeit(rtt):.2f} ms")

    # 1. device_put alone, blocking?
    def put_only():
        return jax.device_put(x, dev)
    print(f"device_put tiny (no read): {timeit(put_only):.2f} ms")

    # 2. 25 sequential device_puts (the problem-assembly pattern)
    xs = [np.ones((64, 64), np.float32) + i for i in range(25)]

    def put25():
        return [jax.device_put(a, dev) for a in xs]
    print(f"25x device_put 16KB (no read): {timeit(put25):.2f} ms")

    def put3():
        return [jax.device_put(a, dev) for a in xs[:3]]
    print(f"3x device_put 16KB (no read): {timeit(put3):.2f} ms")

    # 3. one jit call with 25 numpy args vs 3 args, read one scalar
    @jax.jit
    def f25(*args):
        s = 0.0
        for a in args:
            s = s + a.sum()
        return s

    @jax.jit
    def f3(a, b, c):
        return a.sum() + b.sum() + c.sum()

    print(f"jit(25 numpy args)+read: {timeit(lambda: np.asarray(f25(*xs))):.2f} ms")
    print(f"jit(3 numpy args)+read: {timeit(lambda: np.asarray(f3(*xs[:3]))):.2f} ms")

    # 4. same but args already on device
    dxs = [jax.device_put(a, dev) for a in xs]
    jax.block_until_ready(dxs)
    print(f"jit(25 device args)+read: {timeit(lambda: np.asarray(f25(*dxs))):.2f} ms")
    print(f"jit(3 device args)+read: {timeit(lambda: np.asarray(f3(*dxs[:3]))):.2f} ms")

    # 5. chain of 5 jit calls device-to-device, single read at the end
    @jax.jit
    def g(a):
        return a * 1.0001 + 1.0

    def chain5():
        y = dxs[0]
        for _ in range(5):
            y = g(y)
        return np.asarray(y)
    print(f"5-chain jit + 1 read: {timeit(chain5):.2f} ms")

    def chain5_block():
        y = dxs[0]
        for _ in range(5):
            y = np.asarray(g(jnp.asarray(y)))
        return y
    print(f"5-chain jit + 5 reads (np roundtrip): {timeit(chain5_block):.2f} ms")

    # 6. big transfer: 1 MB up
    big = np.ones((512, 512), np.float32)

    def putbig():
        return jax.device_put(big, dev)
    print(f"device_put 1MB: {timeit(putbig):.2f} ms")


if __name__ == "__main__":
    main()
