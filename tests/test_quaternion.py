import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gvins_tpu.core import quaternion as quat


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_mul_matches_matrix_product():
    qa, qb = random_quats(16, 1), random_quats(16, 2)
    Rab = quat.to_matrix(quat.mul(qa, qb))
    RaRb = jnp.einsum("nij,njk->nik", quat.to_matrix(qa), quat.to_matrix(qb))
    np.testing.assert_allclose(Rab, RaRb, atol=1e-12)


def test_rotate_matches_matrix():
    q = random_quats(16)
    v = jnp.asarray(np.random.default_rng(3).normal(size=(16, 3)))
    np.testing.assert_allclose(
        quat.rotate(q, v), jnp.einsum("nij,nj->ni", quat.to_matrix(q), v), atol=1e-12
    )


def test_matrix_roundtrip():
    q = random_quats(64, 5)
    q2 = quat.from_matrix(quat.to_matrix(q))
    # sign canonicalized to w>=0
    qc = jnp.where(q[..., 3:4] < 0, -q, q)
    np.testing.assert_allclose(q2, qc, atol=1e-9)


def test_matrix_roundtrip_near_pi():
    # rotations near 180 deg exercise the non-trace pivots of from_matrix
    axis = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.6, -0.8, 0]])
    rv = jnp.asarray(axis * (np.pi - 1e-7))
    q = quat.from_rotvec(rv)
    q2 = quat.from_matrix(quat.to_matrix(q))
    np.testing.assert_allclose(np.abs(np.sum(np.asarray(q2 * q), axis=-1)), 1.0, atol=1e-7)


def test_rotvec_roundtrip():
    rng = np.random.default_rng(7)
    rv = jnp.asarray(rng.normal(size=(32, 3)))
    np.testing.assert_allclose(quat.to_rotvec(quat.from_rotvec(rv)), rv, atol=1e-9)
    # small angles
    rv_small = jnp.asarray(rng.normal(size=(8, 3)) * 1e-12)
    np.testing.assert_allclose(quat.to_rotvec(quat.from_rotvec(rv_small)), rv_small, atol=1e-18)


def test_zero_rotvec():
    q = quat.from_rotvec(jnp.zeros(3))
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-15)
    np.testing.assert_allclose(quat.to_rotvec(q), [0, 0, 0], atol=1e-15)


def test_euler_roundtrip():
    rng = np.random.default_rng(11)
    euler = np.stack(
        [
            rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 32),
            rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 32),
            rng.uniform(0.01, 2 * np.pi - 0.01, 32),
        ],
        axis=-1,
    )
    out = quat.matrix_to_euler(quat.euler_to_matrix(jnp.asarray(euler)))
    np.testing.assert_allclose(out, euler, atol=1e-9)


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    w = jnp.array([-0.3, 0.5, 0.9])
    np.testing.assert_allclose(quat.skew(v) @ w, jnp.cross(v, w), atol=1e-15)


def test_left_right_33():
    qa, qb = random_quats(8, 21), random_quats(8, 22)
    # verify against full 4x4 product matrices built explicitly
    for i in range(8):
        q = np.asarray(qa[i])
        x, y, z, w = q
        L = np.zeros((4, 4))
        L[0, 0] = w
        L[0, 1:] = -q[:3]
        L[1:, 0] = q[:3]
        L[1:, 1:] = w * np.eye(3) + np.asarray(quat.skew(jnp.asarray(q[:3])))
        np.testing.assert_allclose(quat.left33(qa[i]), L[1:, 1:], atol=1e-12)
        R = L.copy()
        R[1:, 1:] = w * np.eye(3) - np.asarray(quat.skew(jnp.asarray(q[:3])))
        np.testing.assert_allclose(quat.right33(qa[i]), R[1:, 1:], atol=1e-12)


def test_boxplus_boxminus():
    pose = jnp.concatenate([jnp.array([1.0, 2.0, 3.0]), random_quats(1, 31)[0]])
    delta = jnp.asarray(np.random.default_rng(9).normal(size=6) * 0.1)
    pose1 = quat.boxplus_pose(pose, delta)
    back = quat.boxminus_pose(pose1, pose)
    np.testing.assert_allclose(back[:3], delta[:3], atol=1e-12)
    # rotation part: boxminus returns 2*vec(dq) ≈ dtheta to first order
    np.testing.assert_allclose(back[3:], delta[3:], atol=2e-4)


def test_jit_and_vmap():
    q = random_quats(8, 41)
    f = jax.jit(jax.vmap(quat.to_matrix))
    np.testing.assert_allclose(f(q), quat.to_matrix(q), atol=1e-15)
