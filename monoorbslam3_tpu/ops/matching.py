"""Batched Hamming matching kernels.

TPU-native analog of the reference ORBMatcher (modules/ORB/ORBMatcher.cpp):
instead of per-feature scans over grid-cell candidate lists, every search
strategy is one dense masked [N, M] Hamming-distance problem — XOR +
popcount in a matmul-shaped block computation, followed by masked row
argmin, ratio test, and a rotation-consistency histogram. The reference's
five search variants (ORBMatcher.h:21-45) map onto one core kernel plus
different mask builders:

- SearchForInitialization  -> window mask + ratio test + rotation check
- SearchByProjection       -> projection-radius mask (+ level/view-cos gates)
- SearchByBow              -> vocabulary node-id equality mask
- SearchForTriangulation   -> node-id mask + epipolar gate
- Fuse                     -> projection mask, best-only

Descriptors are bit-packed [K, 8] uint32 (256-bit rBRIEF).
Thresholds follow ORBMatcher.cpp:13-15: TH_LOW=50, TH_HIGH=100,
HISTO_LENGTH=30.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30
BIG = 1 << 20  # python int: inlined as a literal, never a hoisted const buffer


def _unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """Bit-packed [K, 8] u32 -> [K, 256] bf16 in {-1, +1} (bit order fixed
    but arbitrary — both operands use the same order)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256).astype(jnp.bfloat16)
    return 2.0 * bits - 1.0


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] u32 x [M, 8] u32 -> [N, M] int32 Hamming distances.

    TPU-native formulation: unpack to +-1 vectors and ride the MXU —
    for a, b in {0,1}^256 with A = 2a-1, B = 2b-1:
        hamming(a, b) = (256 - A.B) / 2.
    Products are +-1 (exact in bf16) and the f32 accumulator holds
    integers <= 256 exactly, so the distances are exact. This replaces
    the reference's per-pair 32-bit parallel bit count
    (ORBMatcher.cpp:17-31) with one [N,256]x[256,M] matmul — the shape
    the MXU is built for — instead of a lane-starved [N,M,8] XOR+popcount
    elementwise block (minor dim 8 of 128 lanes).
    """
    A = _unpack_pm1(desc_a)
    B = _unpack_pm1(desc_b)
    dot = jnp.matmul(A, B.T, preferred_element_type=jnp.float32)
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def rotation_consistency_mask(angles_a, angles_b, match_idx, matched,
                              min_keep_frac: float = 0.0):
    """Keep only matches whose orientation difference lands in one of the 3
    dominant histogram bins (ORBMatcher.cpp:594-622).

    angles in radians; matched: [N] bool; match_idx: [N] into B.

    min_keep_frac: if the 3 dominant bins hold less than this fraction of
    the matches, the histogram carries no consistent rotation signal (IC
    angles noisy, e.g. under fast view sweeps) and the gate disables
    itself — measured on the fast-rotation world: the raw top-3 filter
    sheds ~half the TRUE matches and quadruples tracking deaths. The
    reference applies the filter unconditionally (its CPU per-cell search
    feeds it far fewer, cleaner candidates)."""
    two_pi = 2.0 * jnp.pi
    rot = angles_a - angles_b[match_idx]
    rot = jnp.mod(rot, two_pi)
    bins = jnp.clip((rot * (HISTO_LENGTH / two_pi)).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    counts = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bins].add(matched.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)
    c1, c2, c3 = top3[0][0], top3[0][1], top3[0][2]
    i1, i2, i3 = top3[1][0], top3[1][1], top3[1][2]
    # reference drops bins 2/3 when much weaker than the best
    keep2 = c2.astype(jnp.float32) > 0.1 * c1.astype(jnp.float32)
    keep3 = c3.astype(jnp.float32) > 0.1 * c1.astype(jnp.float32)
    ok = (bins == i1) | (keep2 & (bins == i2)) | (keep3 & (bins == i3))
    if min_keep_frac > 0.0:
        n_match = jnp.maximum(jnp.sum(matched), 1)
        kept = jnp.sum(matched & ok)
        ambiguous = kept < min_keep_frac * n_match
        ok = ok | ambiguous
    return matched & ok


@partial(jax.jit, static_argnames=("mutual", "use_ratio"))
def masked_nn_match(
    dists: jnp.ndarray,  # [N, M] int32
    pair_mask: jnp.ndarray,  # [N, M] bool — candidate gate
    max_dist: int | jnp.ndarray = TH_LOW,
    ratio: float | jnp.ndarray = 0.9,
    mutual: bool = True,
    use_ratio: bool = True,
):
    """Row-wise best match under a candidate mask.

    Returns (match_idx [N] int32 (-1 = none), match_dist [N] int32).
    - best/second-best ratio test as in SearchForInitialization
      (ORBMatcher.cpp:90-101);
    - optional mutual (col-wise best) consistency, the batched analog of the
      reference's `matched_bi` bookkeeping.
    """
    d = jnp.where(pair_mask, dists, BIG)
    neg = -d  # top_k is max-based
    top2 = jax.lax.top_k(neg, 2)
    best = -top2[0][:, 0]
    second = -top2[0][:, 1]
    best_idx = top2[1][:, 0]

    ok = best <= max_dist
    if use_ratio:
        # strict <: a perfect duplicate (best == second) must fail the test
        ok &= best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    if mutual:
        col_best = jnp.argmin(d, axis=0)  # [M]
        ok &= col_best[best_idx] == jnp.arange(d.shape[0])
    idx = jnp.where(ok, best_idx, -1)
    dist = jnp.where(ok, best, BIG)
    return idx.astype(jnp.int32), dist


def window_mask(xy_a, xy_b, valid_a, valid_b, radius):
    """[N,2] x [M,2] -> [N,M] bool: |dx|<r and |dy|<r (init search window,
    ORBMatcher.cpp:47-57)."""
    dx = jnp.abs(xy_a[:, None, 0] - xy_b[None, :, 0])
    dy = jnp.abs(xy_a[:, None, 1] - xy_b[None, :, 1])
    return (dx < radius) & (dy < radius) & valid_a[:, None] & valid_b[None, :]


def projection_mask(
    proj_uv,  # [N, 2] predicted projections of source features/points
    proj_valid,  # [N]
    xy_b,  # [M, 2] target keypoints
    valid_b,  # [M]
    radius,  # [N] per-source search radius (already scale-adjusted)
    level_b=None,  # [M] target keypoint levels
    level_min=None,  # [N]
    level_max=None,  # [N]
):
    """Circular search-region mask for projection-guided matching
    (ORBMatcher.cpp:203-415)."""
    dx = proj_uv[:, None, 0] - xy_b[None, :, 0]
    dy = proj_uv[:, None, 1] - xy_b[None, :, 1]
    m = (dx * dx + dy * dy) < (radius[:, None] ** 2)
    m &= proj_valid[:, None] & valid_b[None, :]
    if level_b is not None:
        m &= (level_b[None, :] >= level_min[:, None]) & (level_b[None, :] <= level_max[:, None])
    return m


def node_mask(words_a, words_b, valid_a, valid_b):
    """Vocabulary-node equality mask — the dense analog of iterating shared
    FeatureVector nodes in SearchByBow (ORBMatcher.cpp:131-185)."""
    return (words_a[:, None] == words_b[None, :]) & valid_a[:, None] & valid_b[None, :] & (words_a[:, None] >= 0)


def node_gate(groups_a, groups_b):
    """Soft vocabulary-node gate: same-node pairs pass; a side with no
    vocabulary information (group < 0, the sentinel used when BoW is
    disabled or for pre-vocabulary keyframes) passes everything. One trace
    serves both the BoW-gated and the dense matching modes."""
    ga = groups_a[:, None]
    gb = groups_b[None, :]
    return (ga == gb) | (ga < 0) | (gb < 0)


@partial(jax.jit, static_argnames=("mutual", "use_ratio", "use_rotation"))
def match_descriptors(
    desc_a, desc_b, pair_mask,
    angles_a=None, angles_b=None,
    max_dist=TH_LOW, ratio=0.9,
    mutual=True, use_ratio=True, use_rotation=False,
):
    """Full matching step: Hamming + masked NN + optional rotation histogram."""
    dists = hamming_matrix(desc_a, desc_b)
    idx, dist = masked_nn_match(dists, pair_mask, max_dist, ratio, mutual, use_ratio)
    matched = idx >= 0
    if use_rotation:
        safe_idx = jnp.maximum(idx, 0)
        matched = rotation_consistency_mask(angles_a, angles_b, safe_idx, matched)
        idx = jnp.where(matched, idx, -1)
    return idx, jnp.where(matched, dist, BIG)
