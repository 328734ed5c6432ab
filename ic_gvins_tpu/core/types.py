"""Core data types: all sensor/state containers are NamedTuple pytrees.

Replaces the reference's POD structs (common/types.h:32-63,
preintegration/integration_state.h:35-99) with fixed-shape, batchable
pytrees. An ``ImuBatch`` holds an *array* of samples (padded + masked) —
the increment form (dtheta, dvel) matches the reference convention.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ImuBatch(NamedTuple):
    """A padded batch/series of IMU samples in increment form.

    time:   (..., S) sample end-times [s]
    dt:     (..., S) sample intervals [s] (0 for padding => exact no-op)
    dtheta: (..., S, 3) integrated angle increments [rad]
    dvel:   (..., S, 3) integrated velocity increments [m/s]
    odovel: (..., S) odometer distance increment [m] (0 when unused)
    """

    time: jnp.ndarray
    dt: jnp.ndarray
    dtheta: jnp.ndarray
    dvel: jnp.ndarray
    odovel: jnp.ndarray

    @staticmethod
    def zeros(shape, dtype=jnp.float64):
        s = tuple(np.atleast_1d(shape))
        return ImuBatch(
            time=jnp.zeros(s, dtype),
            dt=jnp.zeros(s, dtype),
            dtheta=jnp.zeros(s + (3,), dtype),
            dvel=jnp.zeros(s + (3,), dtype),
            odovel=jnp.zeros(s, dtype),
        )


class NavState(NamedTuple):
    """Full navigation state (integration_state.h:35-51).

    q is xyzw. All fields broadcast over leading batch dims.
    sodo/sg/sa cover the odometer-scale and IMU-scale model variants.
    """

    time: jnp.ndarray
    p: jnp.ndarray
    q: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    sodo: jnp.ndarray
    sg: jnp.ndarray
    sa: jnp.ndarray

    @staticmethod
    def identity(dtype=jnp.float64):
        z3 = jnp.zeros(3, dtype)
        return NavState(
            time=jnp.zeros((), dtype),
            p=z3,
            q=jnp.array([0.0, 0.0, 0.0, 1.0], dtype),
            v=z3,
            bg=z3,
            ba=z3,
            sodo=jnp.zeros((), dtype),
            sg=z3,
            sa=z3,
        )

    def to_pose_mix(self):
        """Flatten to the optimizer parameter blocks: pose[7]=[p,q_xyzw],
        mix[10]=[v,bg,ba,sodo] (integration_state.h:53-66; the NORMAL/EARTH
        variants use the first 9 mix entries)."""
        pose = jnp.concatenate([self.p, self.q], axis=-1)
        mix = jnp.concatenate([self.v, self.bg, self.ba, self.sodo[..., None]], axis=-1)
        return pose, mix

    @staticmethod
    def from_pose_mix(time, pose, mix):
        return NavState(
            time=time,
            p=pose[..., :3],
            q=pose[..., 3:7],
            v=mix[..., :3],
            bg=mix[..., 3:6],
            ba=mix[..., 6:9],
            sodo=mix[..., 9],
            sg=jnp.zeros_like(pose[..., :3]),
            sa=jnp.zeros_like(pose[..., :3]),
        )


class GnssData(NamedTuple):
    """One GNSS fix (types.h:32-40); blh may hold local n-frame coords after
    global2local conversion, mirroring GVINS::addNewGnss (ic_gvins.cc:199-220)."""

    time: jnp.ndarray
    blh: jnp.ndarray
    std: jnp.ndarray
    isyawvalid: jnp.ndarray
    yaw: jnp.ndarray


class IntegrationParams(NamedTuple):
    """IMU stochastic model + gravity + odometer params
    (integration_state.h:68-89). Angle/velocity random walks are in
    rad/sqrt(s) and m/s^1.5; biases are modeled first-order Gauss-Markov."""

    gyr_arw: jnp.ndarray
    acc_vrw: jnp.ndarray
    gyr_bias_std: jnp.ndarray
    acc_bias_std: jnp.ndarray
    corr_time: jnp.ndarray
    gravity: jnp.ndarray          # scalar magnitude
    odo_std: jnp.ndarray          # (3,)
    odo_srw: jnp.ndarray
    abv: jnp.ndarray              # (3,) body-to-vehicle mounting angles
    lodo: jnp.ndarray             # (3,) odometer lever arm
    station: jnp.ndarray          # (3,) origin blh (for earth-rotation rate)

    @staticmethod
    def default():
        d = jnp.float64
        return IntegrationParams(
            gyr_arw=jnp.asarray(0.1 * np.pi / 180.0 / 60.0, d),
            acc_vrw=jnp.asarray(0.1 / 60.0, d),
            gyr_bias_std=jnp.asarray(50.0 * np.pi / 180.0 / 3600.0, d),
            acc_bias_std=jnp.asarray(50.0e-5, d),
            corr_time=jnp.asarray(3600.0, d),
            gravity=jnp.asarray(9.80, d),
            odo_std=jnp.full((3,), 0.1, d),
            # 1000 PPM/sqrt(Hz) converted to 1/sqrt(s)
            # (integration_state.h:83: odo_srw is PPM/sqrt(Hz))
            odo_srw=jnp.asarray(1.0e-3, d),
            abv=jnp.zeros(3, d),
            lodo=jnp.zeros(3, d),
            station=jnp.zeros(3, d),
        )


# Preintegration model variants (preintegration/preintegration.h:34-45)
PREINT_NORMAL = 0
PREINT_ODO = 1
PREINT_EARTH = 2
PREINT_EARTH_ODO = 3
