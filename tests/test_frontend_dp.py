"""Data-parallel bulk extraction must match per-frame extraction exactly
(8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from monoorbslam3_tpu.ops.orb import OrbExtractor
from monoorbslam3_tpu.parallel.frontend_dp import (
    make_batch_extractor, shard_images,
)


def test_batch_extract_matches_single_frame():
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devices, ("dp",))

    H, W = 120, 160
    ext = OrbExtractor(H, W, n_features=128, n_levels=3)
    rng = np.random.default_rng(3)
    # smooth random texture so FAST finds stable corners
    base = rng.uniform(0, 255, (8, H // 4, W // 4)).astype(np.float32)
    images = np.stack([
        np.kron(b, np.ones((4, 4), np.float32)) for b in base
    ])

    run = make_batch_extractor(ext, mesh)
    batched = run(shard_images(jnp.asarray(images), mesh))

    singles = [ext(images[i]) for i in range(8)]
    for key in ("xy", "response", "level", "angle", "desc", "valid"):
        got = np.asarray(batched[key])
        want = np.stack([np.asarray(s[key]) for s in singles])
        np.testing.assert_array_equal(got, want, err_msg=key)

    # at least some real detections so the comparison is not vacuous
    assert int(np.asarray(batched["valid"]).sum()) > 8


def test_batch_extract_rejects_indivisible_batch():
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))
    ext = OrbExtractor(64, 64, n_features=32, n_levels=2)
    run = make_batch_extractor(ext, mesh)
    try:
        run(jnp.zeros((5, 64, 64)))
    except ValueError:
        return
    raise AssertionError("expected ValueError for indivisible batch")
