"""Frames/s scaling-efficiency benchmark over a device mesh.

BASELINE.md target: ">= 75% frames/s scaling efficiency at 2+ hosts;
reported at 1 chip / 1 host / N >= 2 hosts". Real multi-chip hardware is
not available in this environment, so this benchmark measures the SAME
sharded program (parallel/frontend_dp.make_batch_extractor: shard_map
over a dp axis, zero collectives) on a virtual N-device CPU mesh — the
sharding/collective structure is identical to a real multi-chip mesh;
only the per-device kernel speed differs (the single-chip kernel number
comes from bench.py on the real TPU).

Prints one JSON line per mesh size plus a summary line:
  {"metric": "frontend_dp_scaling_efficiency", "value": E, ...}

Usage: python bench_scaling.py [n_devices ...]   (default: 1 2 4 8)
"""

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # one SINGLE-THREADED virtual device per physical core — with the
    # default multi-threaded CPU backend every virtual device shares one
    # Eigen pool and "scaling" only measures oversubscription
    n_cores = os.cpu_count() or 4
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_cores}"
        " --xla_cpu_multi_thread_eigen=false"
        " intra_op_parallelism_threads=1")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the environment's sitecustomize pre-imports jax with a hardware platform
# selected; env vars alone are ignored (see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def bench_mesh(n_dev: int, frames_per_dev: int = 4, h: int = 384, w: int = 512,
               reps: int = 3):
    import jax
    from jax.sharding import Mesh
    from monoorbslam3_tpu.ops.orb import OrbExtractor
    from monoorbslam3_tpu.parallel import frontend_dp

    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("dp",))
    ext = OrbExtractor(h, w, n_features=768)
    run = frontend_dp.make_batch_extractor(ext, mesh)

    B = n_dev * frames_per_dev
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (B, h, w)).astype(np.float32)
    images = frontend_dp.shard_images(images, mesh)

    out = run(images)
    jax.block_until_ready(out)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(images)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return B / best  # frames per second


def bench_sharded_ba(n_dev: int, n_iters: int = 6, reps: int = 3):
    """Strong scaling of the distributed Schur BA (point-sharded linearize +
    psum'd reduction, parallel/sharded_ba.py) on a large-map window: the
    'context parallelism' analog of SURVEY.md §5 — map size is the sequence
    dimension of this workload."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bench import build_problem
    from monoorbslam3_tpu.parallel.sharded_ba import (
        shard_problem_by_point, sharded_schur_ba)

    problem, cam = build_problem(n_kf=32, n_fixed=8, n_pts=16384,
                                 obs_per_kf=768)
    R_cb = jnp.eye(3)
    t_cb = jnp.zeros(3)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    sharded, dropped = shard_problem_by_point(problem, n_dev)
    assert dropped == 0

    def run():
        kf, pts, info = sharded_schur_ba(sharded, cam, R_cb, t_cb, mesh,
                                         n_iters=n_iters)
        jax.block_until_ready((kf, pts))
        return info

    info = run()  # compile
    assert float(info["cost"]) < float(info["cost0"]), "BA must improve"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return n_iters / best  # iters/s


def main():
    n_cores = os.cpu_count() or 4
    sizes = [int(a) for a in sys.argv[1:]] or [
        n for n in (1, 2, 4, 8) if n <= n_cores]
    ba_base = None
    for n in sizes:
        ips = bench_sharded_ba(n)
        if ba_base is None:
            ba_base = ips / n
        print(json.dumps({
            "metric": "sharded_ba_iters_per_s", "n_devices": n,
            "value": round(ips, 2), "unit": "iters/s",
            "window": "32 KFs, 16384 pts, 24576 obs, VI edges",
            "efficiency": round(ips / (n * ba_base), 3),
        }))
    fps = {}
    base = None
    for n in sizes:
        fps[n] = bench_mesh(n)
        if base is None:
            base = fps[n] / n
        print(json.dumps({
            "metric": "frontend_dp_fps", "n_devices": n,
            "value": round(fps[n], 1), "unit": "frames/s",
            "efficiency": round(fps[n] / (n * base), 3),
        }))
    # headline: efficiency at the first multi-device size (the ">= 2 hosts"
    # target); larger CPU-mesh sizes saturate the HOST's shared memory
    # bandwidth, which a real per-chip-HBM mesh does not share
    n2 = next((n for n in sizes if n > 1), max(sizes))
    eff = fps[n2] / (n2 * base)
    print(json.dumps({
        "metric": "frontend_dp_scaling_efficiency",
        "value": round(eff, 3), "unit": "fraction",
        "n_devices": n2,
        "vs_baseline": round(eff / 0.75, 2),
        "note": "virtual CPU mesh (1 single-threaded device/core); "
                "same shard_map program as a multi-chip dp mesh",
    }))


if __name__ == "__main__":
    main()
