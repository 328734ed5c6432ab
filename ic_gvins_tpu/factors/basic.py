"""GNSS position factor and IMU prior/regularization factors.

Parity targets: GnssFactor (factors/gnss_factor.h:31-71), ImuErrorFactor
(preintegration/imu_error_factor.h:30-94), ImuPosePriorFactor
(imu_pose_prior_factor.h:28-74), ImuMixPriorFactor
(imu_mix_prior_factor.h:28-81).

All residuals are whitened; jacobians are LOCAL (6-dim pose tangent).
Functions are single-factor and vmap over factor tables.
"""

import jax.numpy as jnp

from ..core import quaternion as quat

# Drift-bound soft priors (imu_error_factor.h:89-91)
IMU_GRY_BIAS_STD = 7200.0 / 3600.0 * jnp.pi / 180.0   # 7200 deg/hr in rad/s
IMU_ACC_BIAS_STD = 2.0e4 * 1.0e-5                     # 20000 mGal in m/s^2
ODO_SCALE_STD = 2.0e4 * 1.0e-6


def gnss_residual(pose, blh_local, std, lever):
    """r = (p + R(q) lever - z) / std, 3-dim."""
    p, q = pose[..., :3], pose[..., 3:7]
    return (p + quat.rotate(q, lever) - blh_local) / std


def gnss_jacobian(pose, std, lever):
    """(3,6) local jacobian (gnss_factor.h:58-67)."""
    q = pose[..., 3:7]
    sqrt_info = jnp.diag(1.0 / std)
    J = jnp.zeros((3, 6))
    J = J.at[:, 0:3].set(jnp.eye(3))
    J = J.at[:, 3:6].set(-quat.to_matrix(q) @ quat.skew(lever))
    return sqrt_info @ J


def imu_error_residual(mix):
    """Soft zero prior on the latest biases, 6-dim (imu_error_factor.h:45-66)."""
    return jnp.concatenate([mix[..., 3:6] / IMU_GRY_BIAS_STD, mix[..., 6:9] / IMU_ACC_BIAS_STD], axis=-1)


def imu_error_jacobian():
    J = jnp.zeros((6, 9))
    J = J.at[0:3, 3:6].set(jnp.eye(3) / IMU_GRY_BIAS_STD)
    J = J.at[3:6, 6:9].set(jnp.eye(3) / IMU_ACC_BIAS_STD)
    return J


def imu_error_residual_odo(mix):
    """7-dim odometer variant: biases + sodo/ODO_SCALE_STD
    (imu_error_factor.h:67-83); mix is the 10-dim [v, bg, ba, sodo] block."""
    return jnp.concatenate(
        [
            mix[..., 3:6] / IMU_GRY_BIAS_STD,
            mix[..., 6:9] / IMU_ACC_BIAS_STD,
            mix[..., 9:10] / ODO_SCALE_STD,
        ],
        axis=-1,
    )


def imu_error_jacobian_odo():
    J = jnp.zeros((7, 10))
    J = J.at[0:3, 3:6].set(jnp.eye(3) / IMU_GRY_BIAS_STD)
    J = J.at[3:6, 6:9].set(jnp.eye(3) / IMU_ACC_BIAS_STD)
    J = J.at[6, 9].set(1.0 / ODO_SCALE_STD)
    return J


def pose_prior_residual(pose, pose_prior, std6):
    """6-dim pose prior: translation difference + quaternion-error attitude
    (imu_pose_prior_factor.h:42-55)."""
    dp = pose[..., :3] - pose_prior[..., :3]
    dq = quat.mul(quat.conj(pose[..., 3:7]), pose_prior[..., 3:7])
    return jnp.concatenate([dp, 2.0 * dq[..., :3]], axis=-1) / std6


def pose_prior_jacobian(pose, pose_prior, std6):
    """(6,6) local jacobian (imu_pose_prior_factor.h:57-65)."""
    dq = quat.mul(quat.conj(pose[..., 3:7]), pose_prior[..., 3:7])
    J = jnp.zeros((6, 6))
    J = J.at[0:3, 0:3].set(jnp.eye(3))
    J = J.at[3:6, 3:6].set(-quat.right33(dq))
    return J / std6[:, None]


def mix_prior_residual(mix, mix_prior, std9):
    return (mix - mix_prior) / std9


def mix_prior_jacobian(std9):
    return jnp.diag(1.0 / std9)
