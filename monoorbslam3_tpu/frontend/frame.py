"""Per-image Frame record (host-side) + feature conversion helpers.

TPU-native analog of the reference Frame (modules/BasicObject/Frame.h:22-78):
a plain host record holding fixed-capacity feature arrays (already produced
by the ORB extractor kernel), the body-frame pose state, per-feature map
point assignments, and the IMU buffers for the two preintegration windows
(since-last-frame and since-last-keyframe, Frame.cpp:73-88).

The reference's 40-px grid index for O(1) area queries (Frame.cpp:43-51)
has no analog here: windowed candidate gating is a dense mask inside the
batched Hamming kernel (ops/matching.py), which is faster on TPU than any
bucketing."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..backend.residuals import KfState
from ..models.imu import ImuBuffer, Preintegrated


@dataclass
class Frame:
    time: float
    # fixed-capacity feature arrays (undistorted pixel coords)
    xy: np.ndarray  # [N, 2]
    level: np.ndarray  # [N]
    angle: np.ndarray  # [N]
    desc: np.ndarray  # [N, 8] uint32
    valid: np.ndarray  # [N]
    sigma2: np.ndarray  # [N] measurement variance scale
    # vocabulary node id per feature (-1 = no BoW info; Frame::computeBow
    # analog, Frame.cpp:168-178 — filled by System when a vocabulary is set)
    group: np.ndarray | None = None
    # body state (world frame)
    state: KfState | None = None
    # map point id per feature (-1 = none)
    pt_ids: np.ndarray | None = None
    # preintegration from the previous frame / keyframe
    pre_from_frame: Preintegrated | None = None
    pre_from_kf: Preintegrated | None = None
    ref_kf: int = -1
    n_tracked: int = 0

    def __post_init__(self):
        if self.pt_ids is None:
            self.pt_ids = np.full(len(self.xy), -1, np.int64)

    @property
    def n_features(self) -> int:
        return int(self.valid.sum())


def features_from_extractor(out, camera, scale_factors) -> dict:
    """Convert OrbExtractor output (device dict) into host feature arrays,
    applying keypoint undistortion (Frame.cpp:28) and per-level measurement
    variance (kp-size scaling by camera uncertainty, Frame.cpp:24-26)."""
    import jax.numpy as jnp

    xy_raw = np.asarray(out["xy"])
    level = np.asarray(out["level"])
    valid = np.asarray(out["valid"])
    und = np.asarray(camera.undistort_points(jnp.asarray(xy_raw, jnp.float32)))
    unc = np.asarray(camera.uncertainty(jnp.asarray(xy_raw, jnp.float32)))
    sigma2 = (scale_factors[level] * unc) ** 2
    return {
        "xy": und.astype(np.float32),
        "xy_raw": xy_raw.astype(np.float32),
        "level": level.astype(np.int32),
        "angle": np.asarray(out["angle"]).astype(np.float32),
        "desc": np.asarray(out["desc"]).astype(np.uint32),
        "valid": valid,
        "sigma2": sigma2.astype(np.float32),
    }


def make_frame(time: float, feats: dict) -> Frame:
    return Frame(
        time=time,
        xy=feats["xy"], level=feats["level"], angle=feats["angle"],
        desc=feats["desc"], valid=feats["valid"], sigma2=feats["sigma2"],
        group=feats.get("group"),
    )
