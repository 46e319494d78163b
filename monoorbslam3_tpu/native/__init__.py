"""Native (C++) host-runtime components, built lazily on first import.

The device compute path is JAX/XLA; the host-side runtime around it — the
map-graph scans and the dataset loader/prefetcher that the reference also
implements natively — lives here. Builds with the system toolchain into a
per-version cache; every native function has a Python fallback so the
framework runs without a compiler.

Modules:
- map_ops: covisibility counts + keyframe-redundancy scan
  (KeyFrame.cpp:225-291, LocalMapping.cpp:318-372)
- dataloader: PNG/PNM decode, IMU text parse, threaded in-order image
  prefetch (test/Data.h:14-49; demo mains' cv::imread path)
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

import numpy as np

_exts: dict[str, object] = {}
_LINK_FLAGS = {"dataloader": ["-lz", "-pthread"]}


def _build(name: str) -> str | None:
    src = os.path.join(os.path.dirname(__file__), "src", name + ".cpp")
    cache = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, name + sysconfig.get_config_var("EXT_SUFFIX"))
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(src):
        return so_path
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-o", so_path,
    ] + _LINK_FLAGS.get(name, [])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_ext(name: str = "map_ops"):
    """Returns the compiled module or None (fallback to Python paths)."""
    if name in _exts:
        return _exts[name]
    if os.environ.get("MONOSLAM_NO_NATIVE"):
        _exts[name] = None
        return None
    mod = None
    so_path = _build(name)
    if so_path is not None:
        import importlib.util

        spec = importlib.util.spec_from_file_location(name, so_path)
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except Exception:
            mod = None
    _exts[name] = mod
    return mod


# ---------------------------------------------------------------------------
# map bookkeeping (map_ops)
# ---------------------------------------------------------------------------


def covis_counts(pt_ids: np.ndarray, pt_obs_kf: np.ndarray,
                 pt_n_obs: np.ndarray, max_kf: int, exclude_kf: int) -> np.ndarray:
    """Shared-point counts vs every other keyframe (KeyFrame.cpp:225-291)."""
    ext = get_ext("map_ops")
    pt_ids = np.ascontiguousarray(pt_ids, np.int32)
    if ext is not None:
        raw = ext.covis_counts(
            pt_ids, np.ascontiguousarray(pt_obs_kf, np.int32),
            np.ascontiguousarray(pt_n_obs, np.int32),
            int(pt_obs_kf.shape[1]), int(max_kf), int(exclude_kf),
        )
        return np.frombuffer(raw, np.int32).copy()
    # numpy fallback
    sel = pt_ids[pt_ids >= 0]
    if len(sel) == 0:
        return np.zeros(max_kf, np.int32)
    obs = pt_obs_kf[sel].reshape(-1)
    obs = obs[(obs >= 0) & (obs != exclude_kf)]
    return np.bincount(obs, minlength=max_kf).astype(np.int32)[:max_kf]


def redundancy_count(feat_pt, feat_level, pt_obs_kf, pt_obs_feat, pt_n_obs,
                     kf_feat_level, self_kf: int):
    """(n_checked, n_redundant) for the 90% culling rule
    (LocalMapping.cpp:318-372)."""
    ext = get_ext("map_ops")
    n_feat = int(feat_pt.shape[0])
    if ext is not None:
        return ext.redundancy_count(
            np.ascontiguousarray(feat_pt, np.int32),
            np.ascontiguousarray(feat_level, np.int32),
            np.ascontiguousarray(pt_obs_kf, np.int32),
            np.ascontiguousarray(pt_obs_feat, np.int32),
            np.ascontiguousarray(pt_n_obs, np.int32),
            np.ascontiguousarray(kf_feat_level, np.int32),
            n_feat, int(pt_obs_kf.shape[1]), int(self_kf),
        )
    # numpy fallback (vectorized)
    sel = np.nonzero(feat_pt >= 0)[0]
    if len(sel) == 0:
        return 0, 0
    pids = feat_pt[sel]
    lv = feat_level[sel]
    okf = pt_obs_kf[pids]  # [n, max_obs]
    ofe = pt_obs_feat[pids]
    valid = (okf >= 0) & (okf != self_kf)
    safe_kf = np.maximum(okf, 0)
    safe_fe = np.maximum(ofe, 0)
    levels = kf_feat_level[safe_kf, safe_fe]
    better = (valid & (levels <= lv[:, None] + 1)).sum(1)
    return int(len(sel)), int((better >= 3).sum())


# ---------------------------------------------------------------------------
# dataset loading (dataloader)
# ---------------------------------------------------------------------------


def load_gray(path: str) -> np.ndarray | None:
    """Native PNG/PNM decode to float32 grayscale [H, W] (ITU-R 601 luma),
    or None when the native module is unavailable / the format is out of
    scope (caller falls back to PIL/cv2)."""
    ext = get_ext("dataloader")
    if ext is None:
        return None
    try:
        h, w, buf = ext.load_gray(path)
    except ValueError:
        return None
    return np.frombuffer(buf, np.float32).reshape(h, w).copy()


def parse_imu(path: str) -> np.ndarray | None:
    """Native 't gx gy gz ax ay az' parser (strictly increasing t,
    test/Data.h:29-49) -> [N, 7] float64, or None without the module."""
    ext = get_ext("dataloader")
    if ext is None:
        return None
    raw = ext.parse_imu(path)
    return np.frombuffer(raw, np.float64).reshape(-1, 7).copy()


class ImagePrefetcher:
    """Threaded in-order image prefetch: C++ workers decode ahead of the
    consumer without touching the GIL. Iterating yields float32 [H, W]
    grayscale frames in path order; a frame whose decode fails natively is
    retried with `fallback(path)` (PIL) so exotic formats still stream.

    Falls back to synchronous `fallback` decoding when the native module is
    unavailable."""

    def __init__(self, paths, fallback, workers: int = 2, depth: int = 8):
        self.paths = list(paths)
        self.fallback = fallback
        self._ext = get_ext("dataloader")
        self._cap = (self._ext.prefetch_open(self.paths, int(workers), int(depth))
                     if self._ext is not None else None)
        self._idx = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._idx >= len(self.paths):
            raise StopIteration
        path = self.paths[self._idx]
        self._idx += 1
        if self._cap is None:
            return self.fallback(path)
        out = self._ext.prefetch_next(self._cap)
        if out is None:  # defensive: queue ended early
            raise StopIteration
        h, w, buf = out
        if h == 0:  # native decode failed (buf = error string)
            return self.fallback(path)
        return np.frombuffer(buf, np.float32).reshape(h, w).copy()
