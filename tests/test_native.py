"""Native C++ map-ops kernels must match their numpy fallbacks."""

import numpy as np
import pytest

from monoorbslam3_tpu import native

RNG = np.random.default_rng(23)


@pytest.fixture
def tables():
    max_pt, max_obs, max_kf, n_feat = 200, 8, 16, 64
    pt_obs_kf = np.full((max_pt, max_obs), -1, np.int32)
    pt_obs_feat = np.full((max_pt, max_obs), -1, np.int32)
    pt_n_obs = np.zeros(max_pt, np.int32)
    for p in range(max_pt):
        n = RNG.integers(0, max_obs)
        pt_n_obs[p] = n
        pt_obs_kf[p, :n] = RNG.choice(max_kf, n, replace=False)
        pt_obs_feat[p, :n] = RNG.integers(0, n_feat, n)
    feat_pt = RNG.integers(-1, max_pt, n_feat).astype(np.int32)
    feat_level = RNG.integers(0, 8, n_feat).astype(np.int32)
    kf_feat_level = RNG.integers(0, 8, (max_kf, n_feat)).astype(np.int32)
    return dict(pt_obs_kf=pt_obs_kf, pt_obs_feat=pt_obs_feat,
                pt_n_obs=pt_n_obs, feat_pt=feat_pt, feat_level=feat_level,
                kf_feat_level=kf_feat_level, max_kf=max_kf)


def test_native_extension_builds():
    ext = native.get_ext()
    assert ext is not None, "C++ extension failed to build (toolchain?)"


def test_covis_counts_matches_fallback(tables, monkeypatch):
    t = tables
    got = native.covis_counts(t["feat_pt"], t["pt_obs_kf"], t["pt_n_obs"],
                              t["max_kf"], exclude_kf=3)
    monkeypatch.setitem(native._exts, "map_ops", None)
    ref = native.covis_counts(t["feat_pt"], t["pt_obs_kf"], t["pt_n_obs"],
                              t["max_kf"], exclude_kf=3)
    np.testing.assert_array_equal(got, ref)


def test_redundancy_matches_fallback(tables, monkeypatch):
    t = tables
    got = native.redundancy_count(t["feat_pt"], t["feat_level"],
                                  t["pt_obs_kf"], t["pt_obs_feat"],
                                  t["pt_n_obs"], t["kf_feat_level"], 3)
    monkeypatch.setitem(native._exts, "map_ops", None)
    ref = native.redundancy_count(t["feat_pt"], t["feat_level"],
                                  t["pt_obs_kf"], t["pt_obs_feat"],
                                  t["pt_n_obs"], t["kf_feat_level"], 3)
    assert got == ref
