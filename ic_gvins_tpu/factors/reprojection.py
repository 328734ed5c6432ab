"""Inverse-depth two-frame reprojection factor with time-delay compensation.

Parity target: ReprojectionFactor (factors/reprojection_factor.h:36-158):
2 residuals in the normalized camera plane over parameter blocks
{pose_ref[7], pose_obs[7], extrinsic[7], invdepth[1], td[1]}, with pixel
velocities propagating the time-delay parameter.

Local analytic jacobians: (2,6), (2,6), (2,6), (2,1), (2,1). Single-factor
functions; vmap over the reprojection factor table.
"""

import jax.numpy as jnp

from ..core import quaternion as quat


def _chain(pose0, pose1, ext, invdepth, td, pts0, pts1, vel0, vel1, td0, td1):
    """Forward transform chain; returns intermediates used by residual and
    jacobians."""
    p0, q0 = pose0[..., :3], pose0[..., 3:7]
    p1, q1 = pose1[..., :3], pose1[..., 3:7]
    tic, qic = ext[..., :3], ext[..., 3:7]

    pts0_td = pts0 - (td - td0) * vel0
    pts1_td = pts1 - (td - td1) * vel1

    pts_c0 = pts0_td / invdepth
    pts_b0 = quat.rotate(qic, pts_c0) + tic
    pts_n = quat.rotate(q0, pts_b0) + p0
    pts_b1 = quat.rotate(quat.conj(q1), pts_n - p1)
    pts_c1 = quat.rotate(quat.conj(qic), pts_b1 - tic)
    return pts0_td, pts1_td, pts_c0, pts_b0, pts_n, pts_b1, pts_c1


def residual(pose0, pose1, ext, invdepth, td, pts0, pts1, vel0, vel1, td0, td1, sqrt_info):
    _, pts1_td, _, _, _, _, pts_c1 = _chain(
        pose0, pose1, ext, invdepth, td, pts0, pts1, vel0, vel1, td0, td1
    )
    d1 = pts_c1[..., 2]
    r = pts_c1[..., :2] / d1[..., None] - pts1_td[..., :2]
    return sqrt_info * r


def jacobians(pose0, pose1, ext, invdepth, td, pts0, pts1, vel0, vel1, td0, td1, sqrt_info):
    """Analytic local jacobians (reprojection_factor.h:89-144)."""
    p0, q0 = pose0[..., :3], pose0[..., 3:7]
    p1, q1 = pose1[..., :3], pose1[..., 3:7]
    tic, qic = ext[..., :3], ext[..., 3:7]

    pts0_td, _, pts_c0, pts_b0, _, pts_b1, pts_c1 = _chain(
        pose0, pose1, ext, invdepth, td, pts0, pts1, vel0, vel1, td0, td1
    )
    d1 = pts_c1[2]

    cb0n = quat.to_matrix(q0)
    cnb1 = quat.to_matrix(q1).T
    cbc = quat.to_matrix(qic).T

    reduce = jnp.array(
        [
            [1.0 / d1, 0.0, -pts_c1[0] / (d1 * d1)],
            [0.0, 1.0 / d1, -pts_c1[1] / (d1 * d1)],
        ]
    ) * sqrt_info

    # pose_ref
    J0 = jnp.concatenate([cbc @ cnb1, -cbc @ cnb1 @ cb0n @ quat.skew(pts_b0)], axis=1)
    # pose_obs
    J1 = jnp.concatenate([-cbc @ cnb1, cbc @ quat.skew(pts_b1)], axis=1)
    # extrinsic
    tmp_r = cbc @ cnb1 @ cb0n @ cbc.T
    Jext_t = cbc @ (cnb1 @ cb0n - jnp.eye(3, dtype=cbc.dtype))
    Jext_r = (
        -tmp_r @ quat.skew(pts_c0)
        + quat.skew(tmp_r @ pts_c0)
        + quat.skew(cbc @ (cnb1 @ (cb0n @ tic + p0 - p1) - tic))
    )
    Jext = jnp.concatenate([Jext_t, Jext_r], axis=1)
    # inverse depth
    Jid = (-(reduce @ (tmp_r @ pts0_td)) / (invdepth * invdepth))[:, None]
    # time delay
    Jtd = (-(reduce @ (tmp_r @ vel0)) / invdepth + sqrt_info * vel1[:2])[:, None]

    return reduce @ J0, reduce @ J1, reduce @ Jext, Jid, Jtd
