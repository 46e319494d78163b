"""2x initial-extractor parity (Tracking.cpp:24): monocular init runs on a
double-capacity feature set, then shrinks to the tracker/store capacity."""

import numpy as np

from monoorbslam3_tpu.frontend.frame import Frame
from monoorbslam3_tpu.frontend.tracking import _shrink_frame


def _big_frame(n=64, n_valid=48):
    rng = np.random.default_rng(3)
    f = Frame(
        time=0.0,
        xy=rng.uniform(0, 100, (n, 2)).astype(np.float32),
        level=rng.integers(0, 8, n).astype(np.int32),
        angle=rng.uniform(0, 6.28, n).astype(np.float32),
        desc=rng.integers(0, 2**32, (n, 8), dtype=np.uint32),
        valid=np.arange(n) < n_valid,
        sigma2=np.ones(n, np.float32),
        group=np.full(n, -1, np.int32),
    )
    return f


def test_shrink_frame_keeps_priority_and_remaps():
    f = _big_frame(n=64, n_valid=48)
    desc_before = f.desc.copy()
    xy_before = f.xy.copy()
    priority = np.array([40, 5, 33])
    idx_map = _shrink_frame(f, priority, cap=16)
    assert len(f.xy) == 16 and len(f.valid) == 16 and len(f.pt_ids) == 16
    # every priority feature survives, content preserved under the map
    for old in priority:
        new = idx_map[old]
        assert new >= 0
        np.testing.assert_array_equal(f.desc[new], desc_before[old])
        np.testing.assert_array_equal(f.xy[new], xy_before[old])
    assert f.valid[: 16].all()  # filled from the 48 valid features
    # dropped features map to -1
    assert (idx_map >= 0).sum() == 16


def test_shrink_frame_noop_within_capacity():
    f = _big_frame(n=16, n_valid=12)
    idx_map = _shrink_frame(f, np.array([3]), cap=16)
    np.testing.assert_array_equal(idx_map, np.arange(16))
    assert len(f.xy) == 16


def test_build_system_creates_init_extractor(tmp_path):
    from monoorbslam3_tpu.config import build_system

    system = build_system("settings/synthetic.yaml",
                          config_overrides={"init_features_mult": 2})
    assert system.init_extractor is not None
    assert system.init_extractor.n_features == 2 * system.extractor.n_features
    # the 2x config auto-pairs with the init conditioning gate
    assert system.tracking.init_max_rel_sigma is not None

    # default off: measured weak-corner depth regression (config.py)
    system2 = build_system("settings/synthetic.yaml")
    assert system2.init_extractor is None


def test_image_init_with_double_extractor():
    """Monocular init end-to-end on rendered frames with the 2x extractor:
    the created keyframes must sit at the STORE capacity and tracking must
    continue past init (the shrink remap is load-bearing)."""
    from monoorbslam3_tpu.config import build_system
    from monoorbslam3_tpu.runners.synth import SyntheticDataset

    system = build_system("settings/synthetic.yaml",
                          config_overrides={"init_features_mult": 2})
    dataset = SyntheticDataset("circle:t_end=1.0,fps=10", system.camera,
                               system.calib)
    states = []
    for t, img, imu in dataset.frames():
        states.append(system.track(t, img, imu))
    states = np.asarray(states)
    assert (states == 2).any(), f"never initialized: {states}"
    assert (states == 4).sum() == 0, f"reset during init drive: {states}"
    st = system.store
    assert st.n_keyframes() >= 2
    assert st.kf_feat_xy.shape[1] == system.extractor.n_features
    # init KFs carry a full complement of valid features (the shrink kept
    # the two-view inliers + extractor-order fill)
    k0 = st.keyframe_ids()[0]
    assert st.kf_feat_valid[k0].sum() > 0.5 * system.extractor.n_features
