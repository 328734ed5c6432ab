"""Analytic factor jacobians vs autodiff through the manifold boxplus.

This is the verification the reference conspicuously lacks (SURVEY.md §4):
every analytic local jacobian is compared against jax.jacfwd of the residual
composed with the SO(3)xR3 boxplus retraction at delta=0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.core.types import ImuBatch, IntegrationParams, NavState
from ic_gvins_tpu.factors import basic, preint_factor, reprojection, robust
from ic_gvins_tpu.ins import preintegration as pre

G = 9.8


def rand_pose(seed):
    rng = np.random.default_rng(seed)
    return jnp.concatenate(
        [jnp.asarray(rng.normal(0, 5, 3)), quat.from_rotvec(jnp.asarray(rng.normal(0, 0.6, 3)))]
    )


def rand_mix(seed):
    rng = np.random.default_rng(seed + 100)
    return jnp.concatenate(
        [
            jnp.asarray(rng.normal(0, 2, 3)),
            jnp.asarray(rng.normal(0, 1e-3, 3)),
            jnp.asarray(rng.normal(0, 1e-2, 3)),
        ]
    )


def check_pose_jac(res_fn, pose, J_analytic, atol=1e-7):
    f = lambda d: res_fn(quat.boxplus_pose(pose, d))
    J = jax.jacfwd(f)(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J), atol=atol)


def check_linear_jac(res_fn, x, J_analytic, atol=1e-7):
    J = jax.jacfwd(res_fn)(x)
    np.testing.assert_allclose(np.asarray(J_analytic), np.asarray(J), atol=atol)


def test_gnss_factor():
    pose = rand_pose(1)
    blh = jnp.array([1.0, -2.0, 3.0])
    std = jnp.array([0.05, 0.05, 0.1])
    lever = jnp.array([-0.37, 0.008, 0.353])
    J = basic.gnss_jacobian(pose, std, lever)
    check_pose_jac(lambda p: basic.gnss_residual(p, blh, std, lever), pose, J)


def test_imu_error_factor():
    mix = rand_mix(2)
    check_linear_jac(basic.imu_error_residual, mix, basic.imu_error_jacobian())


def test_pose_prior_factor():
    pose, prior = rand_pose(3), rand_pose(4)
    std = jnp.array([0.1, 0.1, 0.1, 0.01, 0.01, 0.03])
    J = basic.pose_prior_jacobian(pose, prior, std)
    check_pose_jac(lambda p: basic.pose_prior_residual(p, prior, std), pose, J)


def test_mix_prior_factor():
    mix, prior = rand_mix(5), rand_mix(6)
    std = jnp.abs(rand_mix(7)) + 0.01
    check_linear_jac(
        lambda m: basic.mix_prior_residual(m, prior, std), mix, basic.mix_prior_jacobian(std)
    )


def _preint_summary(with_earth, seed=11):
    rng = np.random.default_rng(seed)
    n, dt = 41, 0.005
    w = rng.normal(0, 0.3, (n, 3))
    f = rng.normal(0, 1.0, (n, 3)) + np.array([0, 0, -G])
    imu = ImuBatch(
        time=jnp.asarray(dt * np.arange(n)),
        dt=jnp.concatenate([jnp.zeros(1), jnp.full(n - 1, dt)]),
        dtheta=jnp.asarray(w * dt),
        dvel=jnp.asarray(f * dt),
        odovel=jnp.zeros(n),
    )
    st = NavState.identity()._replace(
        p=jnp.asarray(rng.normal(0, 10, 3)),
        q=quat.from_rotvec(jnp.asarray(rng.normal(0, 0.5, 3))),
        v=jnp.asarray(rng.normal(0, 2, 3)),
        bg=jnp.asarray(rng.normal(0, 1e-3, 3)),
        ba=jnp.asarray(rng.normal(0, 1e-2, 3)),
    )
    params = IntegrationParams.default()._replace(gravity=jnp.asarray(G))
    iewn = jnp.array([6e-5, 0.0, -4e-5]) if with_earth else None
    return pre.preintegrate(params, imu, st, with_earth=with_earth, iewn=iewn)


def _preint_jacobian_case(with_earth):
    summ = _preint_summary(with_earth)
    pose0, mix0 = rand_pose(21), rand_mix(22)
    pose1, mix1 = rand_pose(23), rand_mix(24)
    # at the bias linearization point the analytic jacobians are exact; away
    # from it the rotation/bias coupling is first-order (as in the reference)
    mix0 = mix0.at[3:6].set(summ.bg0)
    mix0 = mix0.at[6:9].set(summ.ba0)

    Jp0, Jm0, Jp1, Jm1 = preint_factor.jacobians(
        summ, pose0, mix0, pose1, mix1, with_earth=with_earth
    )

    res = lambda a, b, c, d: preint_factor.residual(summ, a, b, c, d, with_earth=with_earth)

    J = jax.jacfwd(lambda d: res(quat.boxplus_pose(pose0, d), mix0, pose1, mix1))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jp0), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, mix0 + d, pose1, mix1))(jnp.zeros(9))
    np.testing.assert_allclose(np.asarray(Jm0), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, mix0, quat.boxplus_pose(pose1, d), mix1))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jp1), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, mix0, pose1, mix1 + d))(jnp.zeros(9))
    np.testing.assert_allclose(np.asarray(Jm1), np.asarray(J), atol=1e-6)

    # perturbed biases: first-order agreement (relative few-ppm over the
    # whitened scale, matching the reference's approximation)
    mix0b = mix0.at[3:6].add(1e-4).at[6:9].add(-1e-3)
    Jm0b = preint_factor.jacobians(summ, pose0, mix0b, pose1, mix1, with_earth=with_earth)[1]
    Jexact = jax.jacfwd(lambda d: res(pose0, mix0b + d, pose1, mix1))(jnp.zeros(9))
    scale = float(jnp.abs(Jexact).max())
    np.testing.assert_allclose(np.asarray(Jm0b), np.asarray(Jexact), atol=1e-4 * scale)


def test_preint_factor_jacobians_normal():
    _preint_jacobian_case(with_earth=False)


def test_preint_factor_jacobians_earth():
    _preint_jacobian_case(with_earth=True)


def test_preint_residual_zero_at_truth():
    """Residual vanishes when (state0, state1) match the integrated states."""
    rng = np.random.default_rng(31)
    n, dt = 41, 0.005
    w = rng.normal(0, 0.3, (n, 3))
    f = rng.normal(0, 1.0, (n, 3)) + np.array([0, 0, -G])
    imu = ImuBatch(
        time=jnp.asarray(dt * np.arange(n)),
        dt=jnp.concatenate([jnp.zeros(1), jnp.full(n - 1, dt)]),
        dtheta=jnp.asarray(w * dt),
        dvel=jnp.asarray(f * dt),
        odovel=jnp.zeros(n),
    )
    st = NavState.identity()._replace(
        p=jnp.asarray(rng.normal(0, 10, 3)),
        q=quat.from_rotvec(jnp.asarray(rng.normal(0, 0.5, 3))),
        v=jnp.asarray(rng.normal(0, 2, 3)),
        bg=jnp.asarray(rng.normal(0, 1e-3, 3)),
        ba=jnp.asarray(rng.normal(0, 1e-2, 3)),
    )
    params = IntegrationParams.default()._replace(gravity=jnp.asarray(G))
    summ = pre.preintegrate(params, imu, st, with_earth=False)
    pose0 = jnp.concatenate([st.p, st.q])
    mix0 = jnp.concatenate([st.v, st.bg, st.ba])
    pose1 = jnp.concatenate([summ.end_p, summ.end_q])
    mix1 = jnp.concatenate([summ.end_v, st.bg, st.ba])
    r = preint_factor.residual(summ, pose0, mix0, pose1, mix1, with_earth=False)
    assert float(jnp.abs(r).max()) < 1e-6


def test_reprojection_factor_jacobians():
    pose0, pose1 = rand_pose(41), rand_pose(42)
    # keep the two frames close so the point stays in front of both cameras
    pose1 = pose1.at[:3].set(pose0[:3] + jnp.array([0.3, -0.2, 0.1]))
    pose1 = pose1.at[3:7].set(quat.boxplus_pose(pose0, jnp.array([0, 0, 0, 0.05, -0.03, 0.02]))[3:7])
    ext = jnp.concatenate(
        [jnp.array([0.074, -0.030, 0.128]), quat.from_rotvec(jnp.array([1.2, -1.2, 1.2]))]
    )
    invdepth = jnp.asarray(1.0 / 8.0)
    td = jnp.asarray(0.003)
    pts0 = jnp.array([0.12, -0.08, 1.0])
    pts1 = jnp.array([0.10, -0.06, 1.0])
    vel0 = jnp.array([0.5, 0.2, 0.0])
    vel1 = jnp.array([0.4, 0.1, 0.0])
    td0, td1 = 0.001, 0.002
    sqrt_info = 1.0 / (1.5 / 780.0)

    args = (pts0, pts1, vel0, vel1, td0, td1, sqrt_info)
    J0, J1, Je, Jid, Jtd = reprojection.jacobians(pose0, pose1, ext, invdepth, td, *args)

    res = lambda a, b, c, d, e: reprojection.residual(a, b, c, d, e, *args)

    J = jax.jacfwd(lambda d: res(quat.boxplus_pose(pose0, d), pose1, ext, invdepth, td))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(J0), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, quat.boxplus_pose(pose1, d), ext, invdepth, td))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, pose1, quat.boxplus_pose(ext, d), invdepth, td))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Je), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, pose1, ext, invdepth + d, td))(jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(Jid[:, 0]), np.asarray(J), atol=1e-6)

    J = jax.jacfwd(lambda d: res(pose0, pose1, ext, invdepth, td + d))(jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(Jtd[:, 0]), np.asarray(J), atol=1e-6)


def test_huber_corrector():
    """Corrector reproduces the robustified cost gradient: for cost
    0.5*rho(|r|^2), grad wrt params = J_corr^T r_corr to first order."""
    rng = np.random.default_rng(51)
    r = jnp.asarray(rng.normal(0, 2.0, 5))  # |r|^2 > 1 -> active kernel
    J = jnp.asarray(rng.normal(size=(5, 4)))

    r_c, J_c = robust.correct_block(r, J, True)
    s = float(jnp.dot(r, r))
    rho, drho, _ = robust.huber_rho(jnp.asarray(s))
    # robustified cost = 0.5*rho(s); gradient = drho * J^T r; the corrected
    # gauss-newton gradient is J_c^T r_c
    g_true = drho * (J.T @ r)
    g_corr = J_c.T @ r_c
    np.testing.assert_allclose(np.asarray(g_corr), np.asarray(g_true), atol=1e-10)

    # inactive region: passthrough scaling only
    r2 = jnp.asarray(rng.normal(0, 0.1, 5))
    r_c2, J_c2 = robust.correct_block(r2, J, True)
    np.testing.assert_allclose(np.asarray(r_c2), np.asarray(r2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J_c2), np.asarray(J), atol=1e-12)

    # kernel disabled: identity
    r_c3, J_c3 = robust.correct_block(r, J, False)
    np.testing.assert_allclose(np.asarray(r_c3), np.asarray(r), atol=1e-15)
