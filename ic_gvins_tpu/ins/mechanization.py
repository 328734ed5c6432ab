"""INS mechanization: earth-rotation-aware strapdown integration kernels.

Behavioral parity with MISC::insMechanization / redoInsMechanization
(/root/reference/ic_gvins/ic_gvins/misc.cc:151-261): dual-sample
coning/sculling compensation, optional earth-rotation terms, bias
compensation, average-velocity position update.

TPU-native design: the per-sample recurrence is a ``lax.scan`` body; whole
IMU windows are propagated in ONE fused scan call (vs. the reference's
per-sample C++ loop at IMU rate). Zero-padded samples (dt=0, dtheta=0,
dvel=0) are exact no-ops, so fixed-shape padded batches need no masking.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import quaternion as quat
from ..core.types import ImuBatch, NavState


class MechConfig(NamedTuple):
    """Static mechanization configuration (IntegrationConfiguration,
    integration_state.h:91-99). ``iswithearth`` is a Python bool resolved at
    trace time (two compiled variants, no runtime branch)."""

    gravity: jnp.ndarray   # (3,) n-frame gravity vector [0, 0, g]
    iewn: jnp.ndarray      # (3,) earth rotation rate in n-frame
    iswithearth: bool = True


def _dual_sample(dtheta_pre, dvel_pre, dtheta_cur, dvel_cur):
    """Dual-sample coning/sculling compensated body-frame increments."""
    dvfb = (
        dvel_cur
        + 0.5 * jnp.cross(dtheta_cur, dvel_cur)
        + (jnp.cross(dtheta_pre, dvel_cur) + jnp.cross(dvel_pre, dtheta_cur)) / 12.0
    )
    dtheta = dtheta_cur + jnp.cross(dtheta_pre, dtheta_cur) / 12.0
    return dvfb, dtheta


def compensate(imu: ImuBatch, bg, ba) -> ImuBatch:
    """Remove bias from increment-form IMU samples (dt-scaled)."""
    return imu._replace(
        dtheta=imu.dtheta - imu.dt[..., None] * bg,
        dvel=imu.dvel - imu.dt[..., None] * ba,
    )


def mechanize_step(config: MechConfig, p, q, v, imu_pre: tuple, imu_cur: tuple):
    """One strapdown update. imu_pre/imu_cur = (dt, dtheta, dvel), already
    bias-compensated. Returns updated (p, q, v)."""
    dt_cur, dtheta_pre, dvel_pre, dtheta_cur, dvel_cur = (
        imu_cur[0],
        imu_pre[1],
        imu_pre[2],
        imu_cur[1],
        imu_cur[2],
    )
    dvfb, dtheta = _dual_sample(dtheta_pre, dvel_pre, dtheta_cur, dvel_cur)

    if config.iswithearth:
        # coriolis + gravity increment
        dv_cor_g = (config.gravity - 2.0 * jnp.cross(config.iewn, v)) * dt_cur
        # earth-rotation compensation of the attitude/specific-force frames
        qnn = quat.from_rotvec(-config.iewn * dt_cur)
        Rnn = quat.to_matrix(qnn)
        dvel = 0.5 * (jnp.eye(3) + Rnn) @ quat.rotate(q, dvfb) + dv_cor_g
        q_new = quat.normalize(quat.mul(quat.mul(qnn, q), quat.from_rotvec(dtheta)))
    else:
        dvel = quat.rotate(q, dvfb) + config.gravity * dt_cur
        q_new = quat.normalize(quat.mul(q, quat.from_rotvec(dtheta)))

    p_new = p + dt_cur * v + 0.5 * dt_cur * dvel
    v_new = v + dvel
    return p_new, q_new, v_new


def mechanize_scan_seq(config: MechConfig, state: NavState, imu: ImuBatch, imu_prev=None):
    """Sequential lax.scan reference implementation (one step per sample).

    Kept as the semantics oracle for :func:`mechanize_scan`'s log-depth
    formulation (tests assert equality); also the cheaper choice for very
    short windows."""
    if imu_prev is None:
        prev0 = (jnp.zeros(()), jnp.zeros(3), jnp.zeros(3))
    else:
        prev0 = imu_prev

    bg, ba = state.bg, state.ba

    def body(carry, x):
        p, q, v, prev = carry
        dt, dth_raw, dv_raw = x
        dth = dth_raw - dt * bg
        dv = dv_raw - dt * ba
        cur = (dt, dth, dv)
        p, q, v = mechanize_step(config, p, q, v, prev, cur)
        return (p, q, v, cur), (p, q, v)

    init = (state.p, state.q, state.v, prev0)
    (p, q, v, _), traj = jax.lax.scan(body, init, (imu.dt, imu.dtheta, imu.dvel))

    # padded steps must not advance time
    final_time = jnp.max(jnp.where(imu.dt > 0, imu.time, state.time))
    out = state._replace(time=final_time, p=p, q=q, v=v)
    return out, traj


def mechanize_scan(config: MechConfig, state: NavState, imu: ImuBatch, imu_prev=None):
    """Propagate a NavState through a padded IMU batch.

    imu: (S,) batch; imu_prev: the sample immediately before imu[0] (for the
    dual-sample cross terms); defaults to zeros (pure single-sample start).

    Returns (final NavState, per-sample (p, q, v) arrays of shape (S, ...)).
    Padded samples (dt == 0) are exact no-ops and replicate the running state.

    TPU-native design (ins/parallel_scan.py): the per-sample recurrence of
    MISC::insMechanization (misc.cc:151-206) is reformulated as log-depth
    prefix scans — quaternion prefix products for attitude, an affine
    (coriolis) prefix for velocity, cumsums for position — instead of an
    S-step serial chain. Identical math; differs from
    :func:`mechanize_scan_seq` only by floating-point reassociation."""
    from . import parallel_scan as pscan

    if imu_prev is None:
        prev0 = (jnp.zeros(()), jnp.zeros(3), jnp.zeros(3))
    else:
        prev0 = imu_prev

    dt = imu.dt                                   # (S,)
    dth = imu.dtheta - dt[:, None] * state.bg     # compensated increments
    dvl = imu.dvel - dt[:, None] * state.ba
    dth_pre = pscan.shift_prev(dth, jnp.asarray(prev0[1]))
    dvl_pre = pscan.shift_prev(dvl, jnp.asarray(prev0[2]))
    dvfb, dtheta = pscan.dual_sample(dth, dvl, dth_pre, dvl_pre)
    dqs = quat.from_rotvec(dtheta)                # (S,4)

    if config.iswithearth:
        qnn = quat.from_rotvec(-config.iewn * dt[:, None])
        L, R = pscan.quat_sandwich_prefix(qnn, dqs)
        q_all = quat.normalize(quat.mul(quat.mul(L, state.q), R))
        q_prev = pscan.shift_prev(q_all, state.q)
        # v_k = (I - 2 dt [iewn]x) v_{k-1} + c_k  (coriolis affine map)
        Rnn = quat.to_matrix(qnn)                 # (S,3,3)
        rot = quat.rotate(q_prev, dvfb)
        c = (
            0.5 * (rot + jnp.einsum("sij,sj->si", Rnn, rot))
            + config.gravity * dt[:, None]
        )
        A = jnp.eye(3) - 2.0 * dt[:, None, None] * quat.skew(config.iewn)
        P, cpf = pscan.affine_prefix(A, c)
        v_all = jnp.einsum("sij,j->si", P, state.v) + cpf
    else:
        pre = pscan.quat_prefix(dqs)
        q_all = quat.normalize(quat.mul(state.q, pre))
        q_prev = pscan.shift_prev(q_all, state.q)
        dvel = quat.rotate(q_prev, dvfb) + config.gravity * dt[:, None]
        v_all = state.v + jnp.cumsum(dvel, axis=0)

    v_prev = pscan.shift_prev(v_all, state.v)
    # p_new = p + dt v + 0.5 dt (v_new - v) = p + 0.5 dt (v + v_new)
    p_all = state.p + jnp.cumsum(0.5 * dt[:, None] * (v_prev + v_all), axis=0)

    final_time = jnp.max(jnp.where(dt > 0, imu.time, state.time))
    out = state._replace(time=final_time, p=p_all[-1], q=q_all[-1], v=v_all[-1])
    return out, (p_all, q_all, v_all)


def interpolate_pose(p0, q0, t0, p1, q1, t1, t):
    """Linear position + slerp-equivalent attitude interpolation
    (MISC::statePoseInterpolation, misc.cc:85-100)."""
    s = (t - t0) / (t1 - t0)
    dp = p1 - p0
    dq = quat.mul(quat.conj(q1), q0)  # q1^-1 * q0
    rvec = quat.to_rotvec(dq) * s
    q = quat.normalize(quat.mul(q0, quat.conj(quat.from_rotvec(rvec))))
    return p0 + dp * s, q


def state_to_camera_pose(p, q, tbc, Rbc):
    """Body state -> camera pose (misc.cc:102-108)."""
    Rwb = quat.to_matrix(q)
    return p + Rwb @ tbc, Rwb @ Rbc


def detect_zero_velocity(dtheta, dvel, mask, imudatarate, gyr_threshold=0.002, acc_threshold=0.1):
    """Zero-velocity detection over a masked IMU window
    (MISC::detectZeroVelocity, misc.cc:363-415): per-axis std of the
    rate-form signals below thresholds => stationary.

    Returns (is_zero_velocity, mean_dtheta(3), mean_dvel(3)) where the means
    are of the increment-form samples (caller scales by rate for bias)."""
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    mean_th = jnp.sum(dtheta * m, axis=-2) / n[..., None]
    mean_dv = jnp.sum(dvel * m, axis=-2) / n[..., None]
    var_th = jnp.sum((dtheta - mean_th[..., None, :]) ** 2 * m, axis=-2) / n[..., None]
    var_dv = jnp.sum((dvel - mean_dv[..., None, :]) ** 2 * m, axis=-2) / n[..., None]
    std_th = jnp.sqrt(var_th) * imudatarate
    std_dv = jnp.sqrt(var_dv) * imudatarate
    is_zero = jnp.all(std_th < gyr_threshold, axis=-1) & jnp.all(std_dv < acc_threshold, axis=-1)
    return is_zero, mean_th, mean_dv


# Zero-velocity thresholds (misc.h:70-77)
ZERO_VELOCITY_GYR_THRESHOLD = 0.002  # rad/s
ZERO_VELOCITY_ACC_THRESHOLD = 0.1    # m/s^2
MINIMUM_TIME_INTERVAL = 1.0e-4
