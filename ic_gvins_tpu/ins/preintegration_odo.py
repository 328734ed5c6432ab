"""Odometer-aided IMU preintegration (ODO / EARTH_ODO variants).

Parity targets: PreintegrationOdo (preintegration_odo.cc:27-305) and
PreintegrationEarthOdo (preintegration_earth_odo.cc:28-387): 19-dim error
state (dp, dv, dq, dbg, dba, ds, dsodo), 16-dim noise (gyro/accel white,
gyro/accel GM, odometer white x3, odometer-scale random walk). The wheel
odometer contributes a body-frame translation preintegration ds with
lever-arm and mounting-angle compensation and an estimated scale sodo.

Same lax.scan design as the 15-dim variants (ins/preintegration.py); padded
samples are exact no-ops. The mix parameter block grows to 10
(v, bg, ba, sodo — integration_state.h:59-63).

Like the reference (ic_gvins.cc:100-101 hard-disables isuseodo), the replay
pipeline runs with the odometer off by default; these kernels provide the
capability for odometer-equipped configurations.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import quaternion as quat
from ..core.types import ImuBatch, IntegrationParams, NavState

NUM_STATE = 19
NUM_NOISE = 16

_P, _V, _Q, _BG, _BA, _S, _SODO = 0, 3, 6, 9, 12, 15, 18


class PreintOdoSummary(NamedTuple):
    dt: jnp.ndarray
    dp: jnp.ndarray
    dv: jnp.ndarray
    dq: jnp.ndarray
    ds: jnp.ndarray            # (3,) odometer translation preintegral
    bg0: jnp.ndarray
    ba0: jnp.ndarray
    sodo0: jnp.ndarray
    dp_dbg: jnp.ndarray
    dp_dba: jnp.ndarray
    dv_dbg: jnp.ndarray
    dv_dba: jnp.ndarray
    dq_dbg: jnp.ndarray
    ds_dbg: jnp.ndarray        # (3,3)
    ds_dsodo: jnp.ndarray      # (3,)
    sqrt_info: jnp.ndarray     # (19,19)
    cov: jnp.ndarray
    gravity: jnp.ndarray
    iewn: jnp.ndarray
    sum_dtpn: jnp.ndarray
    end_p: jnp.ndarray
    end_q: jnp.ndarray
    end_v: jnp.ndarray
    end_time: jnp.ndarray


def _noise_diag(params: IntegrationParams):
    nw = params.gyr_arw**2
    na = params.acc_vrw**2
    nbg = 2.0 * params.gyr_bias_std**2 / params.corr_time
    nba = 2.0 * params.acc_bias_std**2 / params.corr_time
    return jnp.concatenate(
        [
            jnp.full(3, nw),
            jnp.full(3, na),
            jnp.full(3, nbg),
            jnp.full(3, nba),
            params.odo_std**2,
            params.odo_srw[None] ** 2,
        ]
    )


def preintegrate_odo(
    params: IntegrationParams,
    imu: ImuBatch,
    state0: NavState,
    *,
    with_earth: bool,
    iewn=None,
):
    """Preintegrate with wheel-odometer fusion. state0.sodo is the
    odometer-scale linearization point; imu.odovel carries per-sample
    odometer distance increments."""
    bg0, ba0, sodo0 = state0.bg, state0.ba, state0.sodo
    gravity = jnp.array([0.0, 0.0, 1.0]) * params.gravity
    q0 = state0.q
    if iewn is None:
        iewn = jnp.zeros(3)
    noise = jnp.diag(_noise_diag(params))
    cvb = quat.euler_to_matrix(params.abv).T
    lodo = params.lodo
    I3 = jnp.eye(3)

    def body(carry, x):
        (dp, dq, dv, ds, ap, aq, av, jac, cov, dt_tot, prev, sum_dtpn) = carry
        dt, dth_raw, dv_raw, odovel = x
        dth = dth_raw - dt * bg0
        dvl = dv_raw - dt * ba0
        dth_pre, dvl_pre = prev

        dvfb = (
            dvl + 0.5 * jnp.cross(dth, dvl)
            + (jnp.cross(dth_pre, dvl) + jnp.cross(dvl_pre, dth)) / 12.0
        )
        dtheta = dth + jnp.cross(dth_pre, dth) / 12.0
        dt_new = dt_tot + dt

        dsodo = jnp.array([1.0, 0.0, 0.0]) * odovel
        s_body = (
            cvb @ dsodo * (1.0 + sodo0)
            - quat.to_matrix(quat.from_rotvec(dth)) @ lodo
            + lodo
        )

        if with_earth:
            dv_cor_g = (gravity - 2.0 * jnp.cross(iewn, av)) * dt
            qnn = quat.from_rotvec(-iewn * dt)
            dvel_abs = 0.5 * (I3 + quat.to_matrix(qnn)) @ quat.rotate(aq, dvfb) + dv_cor_g
            ap_new = ap + dt * av + 0.5 * dt * dvel_abs
            av_new = av + dvel_abs
            aq_new = quat.normalize(quat.mul(quat.mul(qnn, aq), quat.from_rotvec(dtheta)))
            sum_dtpn_new = sum_dtpn + dt * ap_new

            q_mid = quat.mul(
                quat.mul(quat.conj(q0), quat.from_rotvec(-(dt_new - 0.5 * dt) * iewn)),
                quat.mul(q0, dq),
            )
            cbbe = quat.to_matrix(q_mid)
            ds_new = ds + cbbe @ s_body
            dvel_d = cbbe @ dvfb
        else:
            dvel_abs = quat.rotate(aq, dvfb) + gravity * dt
            ap_new = ap + dt * av + 0.5 * dt * dvel_abs
            av_new = av + dvel_abs
            aq_new = quat.normalize(quat.mul(aq, quat.from_rotvec(dtheta)))
            sum_dtpn_new = sum_dtpn

            ds_new = ds + quat.rotate(dq, s_body)
            dvel_d = quat.rotate(dq, dvfb)

        dp_new = dp + dt * dv + 0.5 * dt * dvel_d
        dv_new = dv + dvel_d
        dq_new = quat.normalize(quat.mul(dq, quat.from_rotvec(dtheta)))

        # error-state propagation with post-update attitude. s_sign tracks
        # the reference's per-variant gyro-noise input sign, which matters
        # for the Q-row/S-row cross term of G N G^T (both rows consume gyro
        # white noise): ODO uses (+I, +R skew(lodo)) (preintegration_odo.cc:
        # 262-265), EARTH_ODO (-I, cbb0 skew(lodo)) (preintegration_earth_odo
        # .cc:336-340).
        if with_earth:
            q_full = quat.mul(
                quat.mul(quat.conj(q0), quat.from_rotvec(-iewn * dt_new)),
                quat.mul(q0, dq_new),
            )
            cbb = -quat.to_matrix(q_full)
            s_sign = -1.0
        else:
            cbb = -quat.to_matrix(dq_new)
            s_sign = 1.0

        gm = 1.0 - dt / params.corr_time
        stheta = cvb @ dsodo * (1.0 + sodo0) - jnp.cross(dth, lodo)

        phi = jnp.zeros((NUM_STATE, NUM_STATE))
        phi = phi.at[_P:_P + 3, _P:_P + 3].set(I3)
        phi = phi.at[_P:_P + 3, _V:_V + 3].set(I3 * dt)
        phi = phi.at[_V:_V + 3, _V:_V + 3].set(I3)
        phi = phi.at[_V:_V + 3, _Q:_Q + 3].set(cbb @ quat.skew(dvl))
        phi = phi.at[_V:_V + 3, _BA:_BA + 3].set(cbb * dt)
        phi = phi.at[_Q:_Q + 3, _Q:_Q + 3].set(I3 - quat.skew(dth))
        phi = phi.at[_Q:_Q + 3, _BG:_BG + 3].set(-I3 * dt)
        phi = phi.at[_BG:_BG + 3, _BG:_BG + 3].set(I3 * gm)
        phi = phi.at[_BA:_BA + 3, _BA:_BA + 3].set(I3 * gm)
        phi = phi.at[_S:_S + 3, _Q:_Q + 3].set(cbb @ quat.skew(stheta))
        phi = phi.at[_S:_S + 3, _BG:_BG + 3].set(cbb @ quat.skew(lodo) * dt)
        phi = phi.at[_S:_S + 3, _S:_S + 3].set(I3)
        phi = phi.at[_S:_S + 3, _SODO].set(-cbb @ (cvb @ dsodo))
        phi = phi.at[_SODO, _SODO].set(1.0)

        g = jnp.zeros((NUM_STATE, NUM_NOISE))
        g = g.at[_V:_V + 3, 3:6].set(-cbb)
        g = g.at[_Q:_Q + 3, 0:3].set(s_sign * I3)
        g = g.at[_BG:_BG + 3, 6:9].set(I3)
        g = g.at[_BA:_BA + 3, 9:12].set(I3)
        g = g.at[_S:_S + 3, 0:3].set(-s_sign * cbb @ quat.skew(lodo))
        g = g.at[_S:_S + 3, 12:15].set(-cbb @ cvb * (1.0 + sodo0))
        g = g.at[_SODO, 15].set(1.0)

        gng = g @ noise @ g.T
        qk = 0.5 * dt * (phi @ gng + gng @ phi.T)
        jac_new = phi @ jac
        cov_new = phi @ cov @ phi.T + qk

        carry_new = (
            dp_new, dq_new, dv_new, ds_new, ap_new, aq_new, av_new,
            jac_new, cov_new, dt_new, (dth, dvl), sum_dtpn_new,
        )
        return carry_new, None

    anchor = (imu.dtheta[0] - imu.dt[0] * bg0, imu.dvel[0] - imu.dt[0] * ba0)
    init = (
        jnp.zeros(3), quat.identity(), jnp.zeros(3), jnp.zeros(3),
        state0.p, state0.q, state0.v,
        jnp.eye(NUM_STATE), jnp.zeros((NUM_STATE, NUM_STATE)),
        jnp.zeros(()), anchor, jnp.zeros(3),
    )
    xs = (imu.dt[1:], imu.dtheta[1:], imu.dvel[1:], imu.odovel[1:])
    (dp, dq, dv, ds, ap, aq, av, jac, cov, dt_tot, _, sum_dtpn), _ = jax.lax.scan(
        body, init, xs
    )

    cov_sym = 0.5 * (cov + cov.T)
    info = jnp.linalg.inv(cov_sym)
    sqrt_info = jnp.linalg.cholesky(0.5 * (info + info.T)).T

    end_time = jnp.max(jnp.where(imu.dt > 0, imu.time, state0.time))

    return PreintOdoSummary(
        dt=dt_tot, dp=dp, dv=dv, dq=dq, ds=ds,
        bg0=bg0, ba0=ba0, sodo0=sodo0,
        dp_dbg=jac[_P:_P + 3, _BG:_BG + 3],
        dp_dba=jac[_P:_P + 3, _BA:_BA + 3],
        dv_dbg=jac[_V:_V + 3, _BG:_BG + 3],
        dv_dba=jac[_V:_V + 3, _BA:_BA + 3],
        dq_dbg=jac[_Q:_Q + 3, _BG:_BG + 3],
        ds_dbg=jac[_S:_S + 3, _BG:_BG + 3],
        ds_dsodo=jac[_S:_S + 3, _SODO],
        sqrt_info=sqrt_info, cov=cov_sym,
        gravity=gravity, iewn=iewn, sum_dtpn=sum_dtpn,
        end_p=ap, end_q=aq, end_v=av, end_time=end_time,
    )
