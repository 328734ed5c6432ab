"""Odometer-aided preintegration factor (19 residuals, 10-dim mix block).

Parity: PreintegrationOdo::evaluate / residualJacobian* (preintegration_odo
.cc:40-159) and PreintegrationEarthOdo (preintegration_earth_odo.cc:41-185).
Mix block = [v(3), bg(3), ba(3), sodo(1)]. Local jacobians, vmap-ready.
"""

import jax.numpy as jnp

from ..core import quaternion as quat
from .preint_factor import _lr_corner

NUM_RES = 19
MIX_ODO = 10


def _split(pose, mix):
    return (
        pose[..., :3], pose[..., 3:7],
        mix[..., :3], mix[..., 3:6], mix[..., 6:9], mix[..., 9],
    )


def _corrected(summ, bg, ba, sodo):
    dbg = bg - summ.bg0
    dba = ba - summ.ba0
    dsodo = sodo - summ.sodo0
    cp = summ.dp + summ.dp_dba @ dba + summ.dp_dbg @ dbg
    cv = summ.dv + summ.dv_dba @ dba + summ.dv_dbg @ dbg
    cq = quat.mul(summ.dq, quat.from_rotvec(summ.dq_dbg @ dbg))
    cs = summ.ds + summ.ds_dbg @ dbg + summ.ds_dsodo * dsodo
    return cp, cv, cq, cs


def residual(summ, pose0, mix0, pose1, mix1, *, with_earth: bool):
    p0, q0, v0, bg0, ba0, sodo0 = _split(pose0, mix0)
    p1, q1, v1, bg1, ba1, sodo1 = _split(pose1, mix1)
    dt, g = summ.dt, summ.gravity
    cp, cv, cq, cs = _corrected(summ, bg0, ba0, sodo0)

    if with_earth:
        iewn_skew = quat.skew(summ.iewn)
        p_cor = 2.0 * iewn_skew @ (summ.sum_dtpn - dt * p0)
        v_cor = 2.0 * iewn_skew @ (p1 - p0)
        qnn = quat.from_rotvec(-summ.iewn * dt)
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt + p_cor
        dvn = v1 - v0 - g * dt + v_cor
        qb0b1 = quat.mul(quat.conj(q1), quat.mul(qnn, q0))
        r_p = quat.rotate(quat.conj(q0), dpn) - cp
        r_v = quat.rotate(quat.conj(q0), dvn) - cv
        r_q = 2.0 * quat.mul(qb0b1, cq)[..., :3]
    else:
        r_p = quat.rotate(quat.conj(q0), p1 - p0 - v0 * dt - 0.5 * g * dt * dt) - cp
        r_v = quat.rotate(quat.conj(q0), v1 - v0 - g * dt) - cv
        r_q = 2.0 * quat.mul(quat.conj(cq), quat.mul(quat.conj(q0), q1))[..., :3]

    r_s = quat.rotate(quat.conj(q0), p1 - p0) - cs
    r = jnp.concatenate(
        [r_p, r_v, r_q, bg1 - bg0, ba1 - ba0, r_s, (sodo1 - sodo0)[None]], axis=-1
    )
    return summ.sqrt_info @ r


def jacobians(summ, pose0, mix0, pose1, mix1, *, with_earth: bool):
    p0, q0, v0, bg0, ba0, sodo0 = _split(pose0, mix0)
    p1, q1, v1 = pose1[..., :3], pose1[..., 3:7], mix1[..., :3]
    dt, g = summ.dt, summ.gravity
    cp, cv, cq, cs = _corrected(summ, bg0, ba0, sodo0)
    cnb0 = quat.to_matrix(quat.conj(q0))
    I3 = jnp.eye(3)

    Jp0 = jnp.zeros((NUM_RES, 6))
    Jm0 = jnp.zeros((NUM_RES, MIX_ODO))
    Jp1 = jnp.zeros((NUM_RES, 6))
    Jm1 = jnp.zeros((NUM_RES, MIX_ODO))

    if with_earth:
        iewn_skew = quat.skew(summ.iewn)
        p_cor = 2.0 * iewn_skew @ (summ.sum_dtpn - dt * p0)
        v_cor = 2.0 * iewn_skew @ (p1 - p0)
        qnn = quat.from_rotvec(-summ.iewn * dt)
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt + p_cor
        dvn = v1 - v0 - g * dt + v_cor
        qb0b1 = quat.mul(quat.conj(q1), quat.mul(qnn, q0))

        Jp0 = Jp0.at[0:3, 0:3].set(-cnb0 - 2.0 * cnb0 @ iewn_skew * dt)
        Jp0 = Jp0.at[0:3, 3:6].set(quat.skew(cnb0 @ dpn))
        Jp0 = Jp0.at[3:6, 0:3].set(-2.0 * cnb0 @ iewn_skew)
        Jp0 = Jp0.at[3:6, 3:6].set(quat.skew(cnb0 @ dvn))
        Jp0 = Jp0.at[6:9, 3:6].set(_lr_corner(qb0b1, cq))

        Jp1 = Jp1.at[0:3, 0:3].set(cnb0)
        Jp1 = Jp1.at[3:6, 0:3].set(2.0 * cnb0 @ iewn_skew)
        Jp1 = Jp1.at[6:9, 3:6].set(-quat.right33(quat.mul(qb0b1, cq)))

        rot_m0 = quat.left33(quat.mul(qb0b1, summ.dq)) @ summ.dq_dbg
    else:
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt
        dvn = v1 - v0 - g * dt
        q10 = quat.mul(quat.conj(q1), q0)

        Jp0 = Jp0.at[0:3, 0:3].set(-cnb0)
        Jp0 = Jp0.at[0:3, 3:6].set(quat.skew(cnb0 @ dpn))
        Jp0 = Jp0.at[3:6, 3:6].set(quat.skew(cnb0 @ dvn))
        Jp0 = Jp0.at[6:9, 3:6].set(-_lr_corner(q10, cq))

        Jp1 = Jp1.at[0:3, 0:3].set(cnb0)
        Jp1 = Jp1.at[6:9, 3:6].set(
            quat.left33(quat.mul(quat.conj(cq), quat.mul(quat.conj(q0), q1)))
        )

        rot_m0 = -quat.left33(quat.mul(quat.conj(q1), quat.mul(q0, summ.dq))) @ summ.dq_dbg

    # odometer rows (shared by both variants; preintegration_odo.cc:95-110)
    Jp0 = Jp0.at[15:18, 0:3].set(-cnb0)
    Jp0 = Jp0.at[15:18, 3:6].set(quat.skew(cnb0 @ (p1 - p0)))
    Jp1 = Jp1.at[15:18, 0:3].set(cnb0)

    Jm0 = Jm0.at[0:3, 0:3].set(-cnb0 * dt)
    Jm0 = Jm0.at[0:3, 3:6].set(-summ.dp_dbg)
    Jm0 = Jm0.at[0:3, 6:9].set(-summ.dp_dba)
    Jm0 = Jm0.at[3:6, 0:3].set(-cnb0)
    Jm0 = Jm0.at[3:6, 3:6].set(-summ.dv_dbg)
    Jm0 = Jm0.at[3:6, 6:9].set(-summ.dv_dba)
    Jm0 = Jm0.at[6:9, 3:6].set(rot_m0)
    Jm0 = Jm0.at[9:12, 3:6].set(-I3)
    Jm0 = Jm0.at[12:15, 6:9].set(-I3)
    Jm0 = Jm0.at[15:18, 3:6].set(-summ.ds_dbg)
    Jm0 = Jm0.at[15:18, 9].set(-summ.ds_dsodo)
    Jm0 = Jm0.at[18, 9].set(-1.0)

    Jm1 = Jm1.at[3:6, 0:3].set(cnb0)
    Jm1 = Jm1.at[9:12, 3:6].set(I3)
    Jm1 = Jm1.at[12:15, 6:9].set(I3)
    Jm1 = Jm1.at[18, 9].set(1.0)

    U = summ.sqrt_info
    return U @ Jp0, U @ Jm0, U @ Jp1, U @ Jm1
