"""Odometer-aided preintegration: consistency + analytic jacobian checks."""

import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.core.types import ImuBatch, IntegrationParams, NavState
from ic_gvins_tpu.factors import preint_odo_factor
from ic_gvins_tpu.ins import preintegration as pre
from ic_gvins_tpu.ins.preintegration_odo import preintegrate_odo

G = 9.8


def make_imu(n=41, dt=0.005, seed=11, speed=2.0):
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.3, (n, 3))
    f = rng.normal(0, 1.0, (n, 3)) + np.array([0, 0, -G])
    return ImuBatch(
        time=jnp.asarray(dt * np.arange(n)),
        dt=jnp.concatenate([jnp.zeros(1), jnp.full(n - 1, dt)]),
        dtheta=jnp.asarray(w * dt),
        dvel=jnp.asarray(f * dt),
        odovel=jnp.full(n, speed * dt),
    )


def params():
    return IntegrationParams.default()._replace(
        gravity=jnp.asarray(G),
        odo_std=jnp.full(3, 0.05),
        odo_srw=jnp.asarray(1e-3),
        abv=jnp.array([0.01, -0.02, 0.005]),
        lodo=jnp.array([0.3, 0.0, -0.2]),
    )


def start_state(seed=13):
    rng = np.random.default_rng(seed)
    return NavState.identity()._replace(
        p=jnp.asarray(rng.normal(0, 10, 3)),
        q=quat.from_rotvec(jnp.asarray(rng.normal(0, 0.5, 3))),
        v=jnp.asarray(rng.normal(0, 2, 3)),
        bg=jnp.asarray(rng.normal(0, 1e-3, 3)),
        ba=jnp.asarray(rng.normal(0, 1e-2, 3)),
        sodo=jnp.asarray(0.01),
    )


def test_matches_15dim_core():
    """With the odometer rows aside, the 19-dim integrals must equal the
    15-dim variant's (same inputs, same dp/dv/dq/cov core)."""
    imu = make_imu()
    st = start_state()
    s19 = preintegrate_odo(params(), imu, st, with_earth=False)
    s15 = pre.preintegrate(params(), imu, st, with_earth=False)
    np.testing.assert_allclose(s19.dp, s15.dp, atol=1e-12)
    np.testing.assert_allclose(s19.dv, s15.dv, atol=1e-12)
    np.testing.assert_allclose(np.abs(np.dot(s19.dq, s15.dq)), 1.0, atol=1e-12)
    np.testing.assert_allclose(s19.cov[:15, :15][:9, :9], s15.cov[:9, :9], rtol=1e-6, atol=1e-18)


def test_odo_integral_straight_line():
    """Constant forward speed, no rotation, no mounting offsets: ds = v*t*x."""
    n, dt, v = 101, 0.005, 2.0
    imu = ImuBatch(
        time=jnp.asarray(dt * np.arange(n)),
        dt=jnp.concatenate([jnp.zeros(1), jnp.full(n - 1, dt)]),
        dtheta=jnp.zeros((n, 3)),
        dvel=jnp.tile(jnp.array([0, 0, -G * dt]), (n, 1)),
        odovel=jnp.full(n, v * dt),
    )
    p = params()._replace(abv=jnp.zeros(3), lodo=jnp.zeros(3))
    st = NavState.identity()
    s = preintegrate_odo(p, imu, st, with_earth=False)
    np.testing.assert_allclose(s.ds, [v * 0.5, 0, 0], atol=1e-9)


def _odo_jacobian_case(with_earth):
    imu = make_imu(seed=17)
    st = start_state(19)
    iewn = jnp.array([6e-5, 0.0, -4e-5]) if with_earth else None
    summ = preintegrate_odo(params(), imu, st, with_earth=with_earth, iewn=iewn)

    rng = np.random.default_rng(23)
    pose0 = jnp.concatenate([jnp.asarray(rng.normal(0, 5, 3)), quat.from_rotvec(jnp.asarray(rng.normal(0, 0.5, 3)))])
    pose1 = jnp.concatenate([jnp.asarray(rng.normal(0, 5, 3)), quat.from_rotvec(jnp.asarray(rng.normal(0, 0.5, 3)))])
    mix0 = jnp.concatenate([jnp.asarray(rng.normal(0, 2, 3)), summ.bg0, summ.ba0, summ.sodo0[None]])
    mix1 = jnp.concatenate([jnp.asarray(rng.normal(0, 2, 3)), jnp.asarray(rng.normal(0, 1e-3, 3)), jnp.asarray(rng.normal(0, 1e-2, 3)), jnp.asarray([0.005])])

    Jp0, Jm0, Jp1, Jm1 = preint_odo_factor.jacobians(summ, pose0, mix0, pose1, mix1, with_earth=with_earth)
    res = lambda a, b, c, d: preint_odo_factor.residual(summ, a, b, c, d, with_earth=with_earth)

    J = jax.jacfwd(lambda d: res(quat.boxplus_pose(pose0, d), mix0, pose1, mix1))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jp0), np.asarray(J), atol=1e-6)
    J = jax.jacfwd(lambda d: res(pose0, mix0 + d, pose1, mix1))(jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(Jm0), np.asarray(J), atol=1e-6)
    J = jax.jacfwd(lambda d: res(pose0, mix0, quat.boxplus_pose(pose1, d), mix1))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Jp1), np.asarray(J), atol=1e-6)
    J = jax.jacfwd(lambda d: res(pose0, mix0, pose1, mix1 + d))(jnp.zeros(10))
    np.testing.assert_allclose(np.asarray(Jm1), np.asarray(J), atol=1e-6)


def test_odo_factor_jacobians():
    _odo_jacobian_case(False)


def test_earth_odo_factor_jacobians():
    _odo_jacobian_case(True)


def test_bias_scale_jacobian_fd():
    """ds_dbg / ds_dsodo against the true derivative of re-integration."""
    imu = make_imu(seed=29)
    st = start_state(31)
    summ = preintegrate_odo(params(), imu, st, with_earth=False)

    def ds_of(bg, sodo):
        s = st._replace(bg=bg, sodo=sodo)
        return preintegrate_odo(params(), imu, s, with_earth=False).ds

    J_bg = jax.jacfwd(lambda bg: ds_of(bg, st.sodo))(st.bg)
    J_sodo = jax.jacfwd(lambda s: ds_of(st.bg, s))(st.sodo)
    scale = max(1.0, float(jnp.abs(J_bg).max()))
    np.testing.assert_allclose(np.asarray(summ.ds_dbg), np.asarray(J_bg), atol=0.06 * scale)
    np.testing.assert_allclose(np.asarray(summ.ds_dsodo), np.asarray(J_sodo), atol=0.05 * max(1.0, float(jnp.abs(J_sodo).max())))
