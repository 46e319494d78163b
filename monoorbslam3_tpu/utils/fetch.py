"""Single-sync-point device reads (round-5 dispatch-latency work).

Measured cost model of the remote-TPU tunnel (experiments/rtt_probe.py,
2026-08-21, v5 lite): dispatches and host->device transfers PIPELINE —
a chain of 5 jitted calls with one final read costs one round trip
(~26 ms p50 in bad tunnel minutes), while every BLOCKING READ of a jit
output costs a full round trip of its own (5 reads = 134 ms). One
`jax.device_get` of a whole output pytree also costs exactly one round
trip (8 outputs = 28.5 ms).

Rule, therefore: per pipeline stage, dispatch everything, then read ONCE
through `fetch(...)`. The module counts fetches so the e2e harness can
report sync points per frame (VERDICT r04 item 3: ~47 -> target <= 10).
"""

from __future__ import annotations

import jax

_count = [0]


def fetch(*trees):
    """One blocking device->host read of every array in the given pytrees
    (numpy leaves pass through untouched). Returns the same structure(s),
    with device arrays replaced by numpy. Counts as ONE sync point."""
    _count[0] += 1
    out = jax.device_get(trees)
    return out if len(trees) > 1 else out[0]


def sync_count() -> int:
    return _count[0]


def reset_sync_count():
    _count[0] = 0
