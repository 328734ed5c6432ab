"""Quaternion / rotation utilities (Hamilton convention, xyzw storage).

Behavioral parity with the reference rotation helpers
(/root/reference/ic_gvins/ic_gvins/common/rotation.h:35-119): ZYX euler
(front-right-down IMU, RPY out), rotation-vector exp/log maps, skew matrices,
and the 3x3 corner blocks of the quaternion left/right product matrices used
by the analytic factor jacobians.

All functions are pure jnp and batch transparently under ``vmap``; the last
axis of a quaternion array is (x, y, z, w), matching both Eigen's coeffs
layout and the reference's pose[7] = [p(3), q_xyzw(4)] parameter blocks.
"""

import jax.numpy as jnp

_EPS = 1e-12


def identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0])


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def mul(q1, q2):
    """Hamilton product q1 ⊗ q2, xyzw layout."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def rotate(q, v):
    """Rotate vector(s) v by quaternion q (equivalent to R(q) @ v)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def to_matrix(q):
    """Rotation matrix from quaternion (xyzw). Batched over leading dims."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def from_matrix(m):
    """Quaternion (xyzw) from rotation matrix (Shepperd's method, branchless).

    All four pivot constructions are computed and the numerically largest
    pivot is selected with where(), keeping the function vmap/jit friendly."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    piv = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1
    )
    s = jnp.sqrt(jnp.maximum(piv, _EPS))  # s_k = 2*|q_k|

    def _stack(x, y, z, w):
        return jnp.stack([x, y, z, w], axis=-1)

    s0, s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    cand0 = _stack((m21 - m12) / (2 * s0), (m02 - m20) / (2 * s0), (m10 - m01) / (2 * s0), 0.5 * s0)
    cand1 = _stack(0.5 * s1, (m01 + m10) / (2 * s1), (m02 + m20) / (2 * s1), (m21 - m12) / (2 * s1))
    cand2 = _stack((m01 + m10) / (2 * s2), 0.5 * s2, (m12 + m21) / (2 * s2), (m02 - m20) / (2 * s2))
    cand3 = _stack((m02 + m20) / (2 * s3), (m12 + m21) / (2 * s3), 0.5 * s3, (m10 - m01) / (2 * s3))

    idx = jnp.argmax(piv, axis=-1)
    cands = jnp.stack([cand0, cand1, cand2, cand3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2).squeeze(-2)
    # canonical sign: w >= 0
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    return normalize(q)


def from_rotvec(rv):
    """Exp map: rotation vector -> quaternion (xyzw), small-angle safe."""
    angle2 = jnp.sum(rv * rv, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, _EPS * _EPS))
    half = 0.5 * angle
    small = angle2 < 1e-16
    # sin(x/2)/x, guarded for tiny angles with its taylor series
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle2 / 8.0, jnp.cos(half))
    return jnp.concatenate([rv * k, w], axis=-1)


def to_rotvec(q):
    """Log map: quaternion -> rotation vector, small-angle safe."""
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # shortest arc
    vnorm = jnp.linalg.norm(q[..., :3], axis=-1, keepdims=True)
    w = q[..., 3:4]
    angle = 2.0 * jnp.arctan2(vnorm, w)
    small = vnorm < 1e-9
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 0.5), angle / jnp.maximum(vnorm, _EPS))
    return q[..., :3] * scale


def skew(v):
    """Skew-symmetric matrix [v]x; batched over leading dims."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def left33(q):
    """Bottom-right 3x3 of the quaternion left-product matrix: w*I + [v]x.

    Matches Rotation::quaternionleft(q).bottomRightCorner<3,3>()
    (rotation.h:103-110) used throughout the analytic jacobians.
    """
    return q[..., 3, None, None] * jnp.eye(3, dtype=q.dtype) + skew(q[..., :3])


def right33(q):
    """Bottom-right 3x3 of the quaternion right-product matrix: w*I - [v]x."""
    return q[..., 3, None, None] * jnp.eye(3, dtype=q.dtype) - skew(q[..., :3])


def euler_to_matrix(euler):
    """ZYX euler (roll, pitch, yaw) -> C_b^n (rotation.h:84-88)."""
    r, p, y = euler[..., 0], euler[..., 1], euler[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy], axis=-1)
    row1 = jnp.stack([cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy], axis=-1)
    row2 = jnp.stack([-sp, sr * cp, cr * cp], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_to_quat(euler):
    return from_matrix(euler_to_matrix(euler))


def matrix_to_euler(dcm):
    """C_b^n -> RPY, ZYX order, heading in [0, 2pi) (rotation.h:44-66).

    The gimbal-lock branches of the reference are preserved via where()."""
    pitch = jnp.arctan(-dcm[..., 2, 0] / jnp.sqrt(dcm[..., 2, 1] ** 2 + dcm[..., 2, 2] ** 2))
    roll = jnp.arctan2(dcm[..., 2, 1], dcm[..., 2, 2])

    yaw_normal = jnp.arctan2(dcm[..., 1, 0], dcm[..., 0, 0])
    yaw_lock_neg = jnp.arctan2(dcm[..., 1, 2] - dcm[..., 0, 1], dcm[..., 0, 2] + dcm[..., 1, 1])
    yaw_lock_pos = jnp.pi + jnp.arctan2(dcm[..., 1, 2] + dcm[..., 0, 1], dcm[..., 0, 2] - dcm[..., 1, 1])

    yaw = jnp.where(dcm[..., 2, 0] <= -0.999, yaw_lock_neg, yaw_normal)
    yaw = jnp.where(dcm[..., 2, 0] >= 0.999, yaw_lock_pos, yaw)
    yaw = jnp.where(yaw < 0, 2.0 * jnp.pi + yaw, yaw)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_euler(q):
    return matrix_to_euler(to_matrix(q))


def boxplus_pose(pose, delta):
    """Right-multiplicative SO(3)xR3 update on a pose[7] block.

    p' = p + dp; q' = q * exp(dtheta) — the PoseParameterization::Plus of the
    reference (pose_parameterization.h:34-49)."""
    p = pose[..., :3] + delta[..., :3]
    q = normalize(mul(pose[..., 3:7], from_rotvec(delta[..., 3:6])))
    return jnp.concatenate([p, q], axis=-1)


def boxminus_pose(pose, pose0):
    """Local difference used by the marginalization prior replay
    (marginalization_factor.h:63-75): dp = p - p0, dq = 2*vec(q0^-1 q)
    with sign flip when w < 0."""
    dp = pose[..., :3] - pose0[..., :3]
    dq = mul(conj(pose0[..., 3:7]), pose[..., 3:7])
    dtheta = 2.0 * dq[..., :3]
    dtheta = jnp.where(dq[..., 3:4] < 0, -dtheta, dtheta)
    return jnp.concatenate([dp, dtheta], axis=-1)
