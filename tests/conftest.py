"""Test harness config: run all tests on a virtual 8-device CPU mesh.

TPU hardware is exercised by bench.py / the driver; tests must be
deterministic and fast anywhere, so we force the CPU backend with 8 virtual
devices for sharding tests (SURVEY.md §4's "implication for the rebuild").

Note: the environment may pre-import jax with a hardware platform selected
(JAX_PLATFORMS captured at import time), so we must use jax.config.update
rather than environment variables here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
