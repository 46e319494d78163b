"""IMU calibration + on-manifold preintegration as a `lax.scan`.

TPU-native analog of the reference IMU layer (modules/Sensor/Imu.h:15-147,
Imu.cpp:101-205): Forster-style preintegrated ΔR/ΔV/ΔP with 15x15 covariance
(9x9 propagated navigation block + accumulated 6x6 bias random walk) and
first-order bias-correction Jacobians JRg/JVg/JVa/JPg/JPa.

Design changes vs the reference:
- the per-sample update loop (Imu.cpp:101-148) becomes a single `lax.scan`
  over fixed-capacity, mask-padded sample arrays — one compiled kernel per
  capacity, replayable for re-integration after bias updates;
- `ImuCalib` is an immutable pytree, not a singleton;
- raw measurements live in host-side `ImuBuffer`s; re-integration and
  keyframe-merge (Imu.cpp:150-172) are a re-run of the scan on concatenated
  sample arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie

GRAVITY_VALUE = 9.80  # reference: Imu.h:15
# numpy, not jnp — device constants hoist as stale-able const buffers (jax 0.9)
GRAVITY_W = np.array([0.0, 0.0, -GRAVITY_VALUE], np.float32)


class ImuCalib(NamedTuple):
    """Extrinsics + noise model (reference: Imu.cpp:16-56)."""

    R_bc: jnp.ndarray  # [3, 3] camera->body rotation
    t_bc: jnp.ndarray  # [3]
    R_cb: jnp.ndarray  # [3, 3]
    t_cb: jnp.ndarray  # [3]
    cov_noise: jnp.ndarray  # [6] diagonal: gyro^2 x3, acc^2 x3 (discrete, per-sample)
    cov_walk: jnp.ndarray  # [6] diagonal bias random-walk per sample
    bg0: jnp.ndarray  # [3] initial gyro bias
    ba0: jnp.ndarray  # [3] initial acc bias
    freq: float

    @staticmethod
    def create(R_bc, t_bc, noise_gyro, noise_acc, walk_gyro, walk_acc,
               bg0=None, ba0=None, freq=200.0) -> "ImuCalib":
        R_bc = jnp.asarray(R_bc, jnp.float32)
        t_bc = jnp.asarray(t_bc, jnp.float32)
        R_cb = R_bc.T
        t_cb = -R_cb @ t_bc
        cov_noise = jnp.array([noise_gyro**2] * 3 + [noise_acc**2] * 3, jnp.float32)
        cov_walk = jnp.array([walk_gyro**2] * 3 + [walk_acc**2] * 3, jnp.float32)
        bg0 = jnp.zeros(3, jnp.float32) if bg0 is None else jnp.asarray(bg0, jnp.float32)
        ba0 = jnp.zeros(3, jnp.float32) if ba0 is None else jnp.asarray(ba0, jnp.float32)
        return ImuCalib(R_bc, t_bc, R_cb, t_cb, cov_noise, cov_walk, bg0, ba0, float(freq))


class Preintegrated(NamedTuple):
    """Result of preintegrating one sample window at a fixed linearization bias."""

    dR: jnp.ndarray  # [3, 3]
    dV: jnp.ndarray  # [3]
    dP: jnp.ndarray  # [3]
    C: jnp.ndarray  # [15, 15] covariance (r, v, p, bg, ba)
    JRg: jnp.ndarray  # [3, 3] d(dR)/d(bg)
    JVg: jnp.ndarray
    JVa: jnp.ndarray
    JPg: jnp.ndarray
    JPa: jnp.ndarray
    dt: jnp.ndarray  # [] total time
    bg: jnp.ndarray  # [3] linearization gyro bias
    ba: jnp.ndarray  # [3] linearization acc bias

    # --- first-order bias-corrected deltas (reference: Imu.cpp:182-204) ---

    def delta_rotation(self, bg_new: jnp.ndarray) -> jnp.ndarray:
        return lie.normalize_rotation(self.dR @ lie.exp_so3(self.JRg @ (bg_new - self.bg)))

    def delta_velocity(self, bg_new: jnp.ndarray, ba_new: jnp.ndarray) -> jnp.ndarray:
        return self.dV + self.JVg @ (bg_new - self.bg) + self.JVa @ (ba_new - self.ba)

    def delta_position(self, bg_new: jnp.ndarray, ba_new: jnp.ndarray) -> jnp.ndarray:
        return self.dP + self.JPg @ (bg_new - self.bg) + self.JPa @ (ba_new - self.ba)


def _empty_state(bg, ba):
    eye3 = jnp.eye(3, dtype=jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)
    zero33 = jnp.zeros((3, 3), jnp.float32)
    return Preintegrated(
        dR=eye3, dV=zero3, dP=zero3, C=jnp.zeros((15, 15), jnp.float32),
        JRg=zero33, JVg=zero33, JVa=zero33, JPg=zero33, JPa=zero33,
        dt=jnp.float32(0.0), bg=bg, ba=ba,
    )


def preintegrate(
    gyro: jnp.ndarray,  # [N, 3]
    acc: jnp.ndarray,  # [N, 3]
    dts: jnp.ndarray,  # [N]
    mask: jnp.ndarray,  # [N] bool/0-1; padded samples are skipped entirely
    bg: jnp.ndarray,  # [3] linearization gyro bias
    ba: jnp.ndarray,  # [3]
    calib: ImuCalib,
) -> Preintegrated:
    """Scan equivalent of PreIntegrator::IntegrateNewMeasurement (Imu.cpp:101-148)."""
    gyro = jnp.asarray(gyro, jnp.float32)
    acc = jnp.asarray(acc, jnp.float32)
    dts = jnp.asarray(dts, jnp.float32)
    maskf = jnp.asarray(mask, jnp.float32)

    cov_noise = jnp.diag(calib.cov_noise)
    cov_walk15 = jnp.zeros((15, 15), jnp.float32).at[9:, 9:].set(jnp.diag(calib.cov_walk))

    def step(s: Preintegrated, inputs):
        g, a_raw, dt, m = inputs
        w = g - bg
        a = a_raw - ba
        dt2 = dt * dt

        dP = s.dP + s.dV * dt + 0.5 * dt2 * (s.dR @ a)
        dV = s.dV + dt * (s.dR @ a)

        a_hat = lie.hat(a)
        dR_ahat = s.dR @ a_hat

        # A [9,9], B [9,6] exactly as Imu.cpp:105-138 (state order r, v, p)
        A = jnp.eye(9, dtype=jnp.float32)
        A = A.at[3:6, 0:3].set(-dR_ahat * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR_ahat * dt2)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)

        B = jnp.zeros((9, 6), jnp.float32)
        B = B.at[3:6, 3:6].set(s.dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * s.dR * dt2)

        JPg = s.JPg + s.JVg * dt - 0.5 * dt2 * (dR_ahat @ s.JRg)
        JPa = s.JPa + s.JVa * dt - 0.5 * dt2 * s.dR
        JVg = s.JVg - dt * (dR_ahat @ s.JRg)
        JVa = s.JVa - dt * s.dR

        delta_w = w * dt
        deltaR = lie.exp_so3(delta_w)
        rightJ = lie.right_jacobian_so3(delta_w)
        dR = lie.normalize_rotation(s.dR @ deltaR)

        A = A.at[0:3, 0:3].set(deltaR.T)
        B = B.at[0:3, 0:3].set(rightJ * dt)

        C9 = A @ s.C[:9, :9] @ A.T + B @ cov_noise @ B.T
        C = s.C.at[:9, :9].set(C9) + cov_walk15

        JRg = deltaR.T @ s.JRg - rightJ * dt

        new = Preintegrated(
            dR=dR, dV=dV, dP=dP, C=C, JRg=JRg, JVg=JVg, JVa=JVa, JPg=JPg, JPa=JPa,
            dt=s.dt + dt, bg=s.bg, ba=s.ba,
        )
        # masked samples are a strict no-op
        out = jax.tree_util.tree_map(lambda n, o: m * n + (1.0 - m) * o, new, s)
        return out, None

    init = _empty_state(jnp.asarray(bg, jnp.float32), jnp.asarray(ba, jnp.float32))
    final, _ = jax.lax.scan(step, init, (gyro, acc, dts, maskf))
    return final


from ..utils.precision import f32_matmuls

preintegrate_jit = jax.jit(f32_matmuls(preintegrate))


class ImuBuffer:
    """Host-side raw-sample store backing one preintegration window.

    Plays the role of PreIntegrator::measurements (Imu.h:134): keeps raw
    (gyro, acc, dt) so the window can be re-integrated at a new bias
    (Imu.cpp:150-155) or merged into a neighbor on keyframe culling
    (Imu.cpp:157-172) by re-running the scan.
    """

    def __init__(self, capacity: int = 512):
        self.capacity = capacity
        self.gyro = np.zeros((capacity, 3), np.float32)
        self.acc = np.zeros((capacity, 3), np.float32)
        self.dts = np.zeros(capacity, np.float32)
        self.n = 0

    def add(self, gyro, acc, dt):
        if self.n >= self.capacity:
            self._grow()
        self.gyro[self.n] = gyro
        self.acc[self.n] = acc
        self.dts[self.n] = dt
        self.n += 1

    def _grow(self):
        new_cap = self.capacity * 2
        for name in ("gyro", "acc"):
            arr = np.zeros((new_cap, 3), np.float32)
            arr[: self.n] = getattr(self, name)[: self.n]
            setattr(self, name, arr)
        dts = np.zeros(new_cap, np.float32)
        dts[: self.n] = self.dts[: self.n]
        self.dts = dts
        self.capacity = new_cap

    def extend(self, other: "ImuBuffer"):
        for i in range(other.n):
            self.add(other.gyro[i], other.acc[i], other.dts[i])

    def clear(self):
        self.n = 0

    def padded(self, capacity: int | None = None):
        """Returns (gyro, acc, dts, mask) padded to a power-of-two capacity so
        the preintegration scan compiles for a small set of shapes."""
        cap = capacity or max(64, 1 << (max(1, self.n - 1)).bit_length())
        g = np.zeros((cap, 3), np.float32)
        a = np.zeros((cap, 3), np.float32)
        d = np.zeros(cap, np.float32)
        m = np.zeros(cap, np.float32)
        k = min(self.n, cap)
        g[:k] = self.gyro[:k]
        a[:k] = self.acc[:k]
        d[:k] = self.dts[:k]
        m[:k] = 1.0
        return g, a, d, m

    def integrate(self, bg, ba, calib: ImuCalib, capacity: int | None = None) -> Preintegrated:
        g, a, d, m = self.padded(capacity)
        return preintegrate_jit(g, a, d, m, jnp.asarray(bg, jnp.float32),
                                jnp.asarray(ba, jnp.float32), calib)
