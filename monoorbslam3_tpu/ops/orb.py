"""ORB keypoint orientation + rBRIEF descriptors + the full extractor.

TPU-native analog of the reference ORBExtractor (modules/ORB/
ORBExtractor.cpp): IC-angle orientation (.cpp:18-48) and 256-pair rotated
BRIEF (.cpp:495-547), re-architected as batched patch gathers + fused
vector math instead of per-keypoint scalar loops.

Deliberate design difference: the reference hardcodes OpenCV's learned
`bit_pattern_31_` (ORBExtractor.cpp:50-365). We instead generate a
deterministic Gaussian-sampled BRIEF pattern (seed fixed below). Descriptors
are therefore not bit-compatible with OpenCV ORB — they don't need to be:
matching quality is what matters (SURVEY.md §7 stage 3), and the vocabulary
used for BoW bucketing is trained on the same descriptor family.

Descriptors are returned bit-packed as [K, 8] uint32 for the XOR+popcount
Hamming kernels in ops/matching.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import fast as fast_ops
from . import image as image_ops

PATCH = 48  # gathered patch size (square)
HALF = PATCH // 2
ORI_RADIUS = 15  # IC-angle circular patch radius (reference HALF_PATCH_SIZE)
PATTERN_SEED = 20240817
N_PAIRS = 256
PATTERN_SIGMA = 13.0 / 2.0
PATTERN_CLIP = 13


@lru_cache(maxsize=None)
def brief_pattern():
    """Deterministic 256-pair BRIEF sampling pattern, coords in [-13, 13].

    Gaussian-sampled (classic BRIEF G(0, (S/2)^2) scheme); pairs with
    identical endpoints are re-rolled.
    """
    rng = np.random.default_rng(PATTERN_SEED)
    pts = rng.normal(0.0, PATTERN_SIGMA, size=(N_PAIRS * 2, 2))
    pts = np.clip(np.round(pts), -PATTERN_CLIP, PATTERN_CLIP).astype(np.int32)
    pa, pb = pts[:N_PAIRS], pts[N_PAIRS:]
    # re-roll degenerate pairs deterministically
    for i in range(N_PAIRS):
        while (pa[i] == pb[i]).all():
            pb[i] = np.clip(np.round(rng.normal(0, PATTERN_SIGMA, 2)), -PATTERN_CLIP, PATTERN_CLIP)
    return pa.astype(np.float32), pb.astype(np.float32)  # numpy: safe to cache


@lru_cache(maxsize=None)
def _ic_angle_weights():
    """Circular-mask moment weights for the IC angle (31x31, radius 15)."""
    r = ORI_RADIUS
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (x * x + y * y) <= r * r
    wx = (x * mask).astype(np.float32)
    wy = (y * mask).astype(np.float32)
    return wx, wy  # numpy: safe to cache


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Gather [K, PATCH, PATCH] patches centered at integer keypoints.

    img: [H, W]; xy: [K, 2] float (x, y) at this image's scale. Keypoints are
    assumed >= HALF away from the border (enforced by the FAST margin).
    """
    padded = jnp.pad(img, ((HALF, HALF), (HALF, HALF)))
    x = xy[:, 0].astype(jnp.int32)
    y = xy[:, 1].astype(jnp.int32)

    def one(cy, cx):
        return jax.lax.dynamic_slice(padded, (cy, cx), (PATCH, PATCH))

    return jax.vmap(one)(y, x)


def ic_angles(patches_raw: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch (reference IC_Angle,
    ORBExtractor.cpp:18-48). patches: [K, PATCH, PATCH] -> [K] radians."""
    wx, wy = (jnp.asarray(a) for a in _ic_angle_weights())
    c = HALF
    r = ORI_RADIUS
    sub = patches_raw[:, c - r : c + r + 1, c - r : c + r + 1]
    m10 = jnp.einsum("kij,ij->k", sub, wx)
    m01 = jnp.einsum("kij,ij->k", sub, wy)
    return jnp.arctan2(m01, m10)


def brief_descriptors(patches_blur: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BRIEF descriptors. patches: [K, PATCH, PATCH] (blurred),
    angles: [K] -> [K, 8] uint32 (256 bits packed little-endian per word)."""
    pa, pb = (jnp.asarray(a) for a in brief_pattern())  # [256, 2] each, (x, y)
    cos = jnp.cos(angles)[:, None]
    sin = jnp.sin(angles)[:, None]

    def rotate(p):
        # steered BRIEF: sample at R(theta) @ p, rounded to nearest pixel
        x = jnp.round(p[None, :, 0] * cos - p[None, :, 1] * sin)
        y = jnp.round(p[None, :, 0] * sin + p[None, :, 1] * cos)
        return x.astype(jnp.int32) + HALF, y.astype(jnp.int32) + HALF

    ax, ay = rotate(pa)  # [K, 256]
    bx, by = rotate(pb)
    flat = patches_blur.reshape(patches_blur.shape[0], -1)  # [K, PATCH*PATCH]
    ia = jnp.take_along_axis(flat, ay * PATCH + ax, axis=1)
    ib = jnp.take_along_axis(flat, by * PATCH + bx, axis=1)
    bits = (ia < ib).astype(jnp.uint32)  # [K, 256]
    bits = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def level_quotas(n_features: int, n_levels: int, scale: float):
    """Per-level keypoint quotas ∝ (1/scale)^level (reference distributes the
    feature budget the same way, ORBExtractor.cpp:~430)."""
    inv = 1.0 / scale
    weights = np.array([inv**l for l in range(n_levels)])
    raw = n_features * weights / weights.sum()
    quotas = np.floor(raw).astype(int)
    quotas[0] += n_features - quotas.sum()
    return [int(q) for q in quotas]


class OrbExtractor:
    """Jit-compiled whole-image ORB extractor for a fixed resolution.

    Replaces the reference's two ORBExtractor instances (Tracking.cpp:24):
    construct one per (resolution, n_features) config; `__call__` runs the
    full pyramid → FAST → grid-NMS select → IC-angle → rBRIEF pipeline as a
    single XLA program and returns fixed-capacity arrays.
    """

    def __init__(
        self,
        height: int,
        width: int,
        n_features: int = 1024,
        n_levels: int = 8,
        scale: float = 1.2,
        ini_th_fast: float = 20.0,
        min_th_fast: float = 7.0,
        cell: int = 16,
        per_cell: int = 4,
    ):
        self.height, self.width = height, width
        self.n_features = n_features
        self.n_levels = n_levels
        self.scale = scale
        self.ini_th, self.min_th = ini_th_fast, min_th_fast
        self.cell, self.per_cell = cell, per_cell
        self.quotas = level_quotas(n_features, n_levels, scale)
        self.scale_factors = np.array([scale**l for l in range(n_levels)], np.float32)
        self.sigma2 = self.scale_factors**2  # per-level measurement variance scale
        self._fn = jax.jit(self._extract)

    def _extract(self, img: jnp.ndarray):
        img = img.astype(jnp.float32)
        levels = image_ops.build_pyramid(img, self.n_levels, self.scale)

        out_xy, out_resp, out_level, out_angle, out_desc, out_valid = [], [], [], [], [], []
        for lvl, li in enumerate(levels):
            quota = self.quotas[lvl]
            if quota == 0:
                continue
            score = fast_ops.fast_score_map(li, self.min_th)
            score = fast_ops.nms3(score)
            xy, resp, valid = fast_ops.select_keypoints(
                score, quota, cell=self.cell, per_cell=self.per_cell, margin=HALF
            )
            blur = image_ops.gaussian_blur(li)
            patches_raw = gather_patches(li, xy)
            patches_blur = gather_patches(blur, xy)
            ang = ic_angles(patches_raw)
            desc = brief_descriptors(patches_blur, ang)

            out_xy.append(xy * self.scale_factors[lvl])  # level-0 pixel coords
            out_resp.append(resp)
            out_level.append(jnp.full(quota, lvl, jnp.int32))
            out_angle.append(ang)
            out_desc.append(desc)
            out_valid.append(valid)

        return {
            "xy": jnp.concatenate(out_xy),
            "response": jnp.concatenate(out_resp),
            "level": jnp.concatenate(out_level),
            "angle": jnp.concatenate(out_angle),
            "desc": jnp.concatenate(out_desc),
            "valid": jnp.concatenate(out_valid),
        }

    def __call__(self, img) -> dict:
        return self._fn(jnp.asarray(img))
