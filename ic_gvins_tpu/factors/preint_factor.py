"""IMU preintegration factor: whitened residual + analytic local jacobians.

Parity targets: PreintegrationNormal::evaluate / residualJacobian*
(/root/reference/.../preintegration_normal.cc:38-142) and the EARTH variant
(preintegration_earth.cc:37-164). 15 residuals over parameter blocks
{pose0[7], mix0[9], pose1[7], mix1[9]}.

TPU-native: jacobians are produced directly in LOCAL coordinates (6 for the
SO(3)xR3 pose tangent, 9 for the mix block) — the reference emits 7-column
global jacobians and lets Ceres' PoseParameterization drop the last column;
here the manifold lift is the identity on the first 6 columns so we never
materialize the 7th. Everything vmaps over a factor-table axis.
"""

import jax.numpy as jnp

from ..core import quaternion as quat
from ..core.smallmat import mm, mv
from .robust import correct_block  # noqa: F401  (re-export convenience)

NUM_RES = 15


def _lr_corner(a, b):
    """Bottom-right 3x3 block of L4(a) @ R4(b) where L4/R4 are the w-first
    quaternion left/right product matrices (rotation.h:103-119)."""
    av, aw = a[..., :3], a[..., 3]
    bv, bw = b[..., :3], b[..., 3]
    blk = mm(
        aw[..., None, None] * jnp.eye(3) + quat.skew(av),
        bw[..., None, None] * jnp.eye(3) - quat.skew(bv),
    )
    return blk - av[..., :, None] * bv[..., None, :]


def _split(pose, mix):
    return pose[..., :3], pose[..., 3:7], mix[..., :3], mix[..., 3:6], mix[..., 6:9]


def _corrected(summ, bg, ba):
    dbg = bg - summ.bg0
    dba = ba - summ.ba0
    cp = summ.dp + mv(summ.dp_dba, dba) + mv(summ.dp_dbg, dbg)
    cv = summ.dv + mv(summ.dv_dba, dba) + mv(summ.dv_dbg, dbg)
    cq = quat.mul(summ.dq, quat.from_rotvec(mv(summ.dq_dbg, dbg)))
    return cp, cv, cq


def residual(summ, pose0, mix0, pose1, mix1, *, with_earth: bool):
    """Whitened 15-dim residual for one preintegration interval."""
    p0, q0, v0, bg0, ba0 = _split(pose0, mix0)
    p1, _q1, v1, bg1, ba1 = _split(pose1, mix1)
    q1 = pose1[..., 3:7]
    dt = summ.dt
    g = summ.gravity
    cp, cv, cq = _corrected(summ, bg0, ba0)

    if with_earth:
        iewn_skew = quat.skew(summ.iewn)
        p_cor = 2.0 * mv(iewn_skew, summ.sum_dtpn - dt * p0)
        v_cor = 2.0 * mv(iewn_skew, p1 - p0)
        qnn = quat.from_rotvec(-summ.iewn * dt)
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt + p_cor
        dvn = v1 - v0 - g * dt + v_cor
        qb0b1 = quat.mul(quat.conj(q1), quat.mul(qnn, q0))
        r_p = quat.rotate(quat.conj(q0), dpn) - cp
        r_v = quat.rotate(quat.conj(q0), dvn) - cv
        r_q = 2.0 * quat.mul(qb0b1, cq)[..., :3]
    else:
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt
        dvn = v1 - v0 - g * dt
        r_p = quat.rotate(quat.conj(q0), dpn) - cp
        r_v = quat.rotate(quat.conj(q0), dvn) - cv
        r_q = 2.0 * quat.mul(quat.conj(cq), quat.mul(quat.conj(q0), q1))[..., :3]

    r = jnp.concatenate([r_p, r_v, r_q, bg1 - bg0, ba1 - ba0], axis=-1)
    return mv(summ.sqrt_info, r)


def jacobians(summ, pose0, mix0, pose1, mix1, *, with_earth: bool):
    """Analytic whitened local jacobians: (15,6), (15,9), (15,6), (15,9)."""
    p0, q0, v0, bg0, ba0 = _split(pose0, mix0)
    p1 = pose1[..., :3]
    q1 = pose1[..., 3:7]
    v1 = mix1[..., :3]
    dt = summ.dt
    g = summ.gravity
    cp, cv, cq = _corrected(summ, bg0, ba0)
    cnb0 = quat.to_matrix(quat.conj(q0))
    I3 = jnp.eye(3)

    Jp0 = jnp.zeros((NUM_RES, 6))
    Jm0 = jnp.zeros((NUM_RES, 9))
    Jp1 = jnp.zeros((NUM_RES, 6))
    Jm1 = jnp.zeros((NUM_RES, 9))

    if with_earth:
        iewn_skew = quat.skew(summ.iewn)
        p_cor = 2.0 * mv(iewn_skew, summ.sum_dtpn - dt * p0)
        v_cor = 2.0 * mv(iewn_skew, p1 - p0)
        qnn = quat.from_rotvec(-summ.iewn * dt)
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt + p_cor
        dvn = v1 - v0 - g * dt + v_cor
        qb0b1 = quat.mul(quat.conj(q1), quat.mul(qnn, q0))
        cnb0_iewn = mm(cnb0, iewn_skew)

        Jp0 = Jp0.at[0:3, 0:3].set(-cnb0 - 2.0 * cnb0_iewn * dt)
        Jp0 = Jp0.at[0:3, 3:6].set(quat.skew(mv(cnb0, dpn)))
        Jp0 = Jp0.at[3:6, 0:3].set(-2.0 * cnb0_iewn)
        Jp0 = Jp0.at[3:6, 3:6].set(quat.skew(mv(cnb0, dvn)))
        Jp0 = Jp0.at[6:9, 3:6].set(_lr_corner(qb0b1, cq))

        Jp1 = Jp1.at[0:3, 0:3].set(cnb0)
        Jp1 = Jp1.at[3:6, 0:3].set(2.0 * cnb0_iewn)
        Jp1 = Jp1.at[6:9, 3:6].set(-quat.right33(quat.mul(qb0b1, cq)))

        rot_block_m0 = mm(quat.left33(quat.mul(qb0b1, summ.dq)), summ.dq_dbg)
    else:
        dpn = p1 - p0 - v0 * dt - 0.5 * g * dt * dt
        dvn = v1 - v0 - g * dt

        Jp0 = Jp0.at[0:3, 0:3].set(-cnb0)
        Jp0 = Jp0.at[0:3, 3:6].set(quat.skew(mv(cnb0, dpn)))
        Jp0 = Jp0.at[3:6, 3:6].set(quat.skew(mv(cnb0, dvn)))
        q10 = quat.mul(quat.conj(q1), q0)
        Jp0 = Jp0.at[6:9, 3:6].set(-_lr_corner(q10, cq))

        Jp1 = Jp1.at[0:3, 0:3].set(cnb0)
        Jp1 = Jp1.at[6:9, 3:6].set(quat.left33(quat.mul(quat.conj(cq), quat.mul(quat.conj(q0), q1))))

        rot_block_m0 = -mm(quat.left33(quat.mul(quat.conj(q1), quat.mul(q0, summ.dq))), summ.dq_dbg)

    Jm0 = Jm0.at[0:3, 0:3].set(-cnb0 * dt)
    Jm0 = Jm0.at[0:3, 3:6].set(-summ.dp_dbg)
    Jm0 = Jm0.at[0:3, 6:9].set(-summ.dp_dba)
    Jm0 = Jm0.at[3:6, 0:3].set(-cnb0)
    Jm0 = Jm0.at[3:6, 3:6].set(-summ.dv_dbg)
    Jm0 = Jm0.at[3:6, 6:9].set(-summ.dv_dba)
    Jm0 = Jm0.at[6:9, 3:6].set(rot_block_m0)
    Jm0 = Jm0.at[9:12, 3:6].set(-I3)
    Jm0 = Jm0.at[12:15, 6:9].set(-I3)

    Jm1 = Jm1.at[3:6, 0:3].set(cnb0)
    Jm1 = Jm1.at[9:12, 3:6].set(I3)
    Jm1 = Jm1.at[12:15, 6:9].set(I3)

    U = summ.sqrt_info
    return mm(U, Jp0), mm(U, Jm0), mm(U, Jp1), mm(U, Jm1)
