import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core.types import ImuBatch, NavState
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.ins import mechanization as mech


G = 9.8


def make_imu(dt, dtheta_rate, dvel_rate, n, t0=0.0):
    """Constant-rate IMU increments."""
    t = t0 + dt * (np.arange(n) + 1)
    return ImuBatch(
        time=jnp.asarray(t),
        dt=jnp.full(n, dt),
        dtheta=jnp.tile(jnp.asarray(dtheta_rate) * dt, (n, 1)),
        dvel=jnp.tile(jnp.asarray(dvel_rate) * dt, (n, 1)),
        odovel=jnp.zeros(n),
    )


def cfg(with_earth=False, iewn=None):
    return mech.MechConfig(
        gravity=jnp.array([0.0, 0.0, G]),
        iewn=jnp.zeros(3) if iewn is None else jnp.asarray(iewn),
        iswithearth=with_earth,
    )


def test_stationary():
    # stationary: accel senses -g (FRD, z down); state stays put
    imu = make_imu(0.005, [0, 0, 0], [0, 0, -G], 200)
    state = NavState.identity()
    out, _ = mech.mechanize_scan(cfg(), state, imu)
    np.testing.assert_allclose(out.p, 0, atol=1e-12)
    np.testing.assert_allclose(out.v, 0, atol=1e-12)
    np.testing.assert_allclose(out.q, [0, 0, 0, 1], atol=1e-12)
    assert float(out.time) == 1.0


def test_freefall():
    imu = make_imu(0.005, [0, 0, 0], [0, 0, 0], 200)
    out, _ = mech.mechanize_scan(cfg(), NavState.identity(), imu)
    t = 1.0
    np.testing.assert_allclose(out.v, [0, 0, G * t], atol=1e-9)
    np.testing.assert_allclose(out.p, [0, 0, 0.5 * G * t * t], atol=1e-9)


def test_constant_rotation():
    w = np.array([0.0, 0.0, 0.5])  # rad/s about z
    imu = make_imu(0.005, w, [0, 0, 0], 200)
    out, _ = mech.mechanize_scan(cfg(), NavState.identity(), imu)
    q_expect = quat.from_rotvec(jnp.asarray(w * 1.0))
    np.testing.assert_allclose(np.abs(np.dot(np.asarray(out.q), np.asarray(q_expect))), 1.0, atol=1e-9)


def test_bias_compensation():
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.05, 0.02, -0.1])
    # IMU measures bias on top of the stationary signal
    imu = make_imu(0.005, bg, np.array([0, 0, -G]) + ba, 200)
    state = NavState.identity()._replace(bg=jnp.asarray(bg), ba=jnp.asarray(ba))
    out, _ = mech.mechanize_scan(cfg(), state, imu)
    np.testing.assert_allclose(out.p, 0, atol=1e-12)
    np.testing.assert_allclose(out.v, 0, atol=1e-12)


def test_padding_noop():
    imu = make_imu(0.005, [0.1, 0.2, -0.1], [1.0, 0.5, -G], 100)
    padded = ImuBatch(
        time=jnp.concatenate([imu.time, jnp.zeros(28)]),
        dt=jnp.concatenate([imu.dt, jnp.zeros(28)]),
        dtheta=jnp.concatenate([imu.dtheta, jnp.zeros((28, 3))]),
        dvel=jnp.concatenate([imu.dvel, jnp.zeros((28, 3))]),
        odovel=jnp.concatenate([imu.odovel, jnp.zeros(28)]),
    )
    o1, _ = mech.mechanize_scan(cfg(), NavState.identity(), imu)
    o2, _ = mech.mechanize_scan(cfg(), NavState.identity(), padded)
    np.testing.assert_allclose(o1.p, o2.p, atol=1e-15)
    np.testing.assert_allclose(o1.q, o2.q, atol=1e-15)
    np.testing.assert_allclose(o1.v, o2.v, atol=1e-15)
    assert float(o1.time) == float(o2.time)


def test_earth_rotation_stationary():
    # with earth terms enabled and a gyro measuring exactly iewn, a stationary
    # body stays stationary (attitude compensates earth rotation)
    iewn = np.array([7.29e-5 * np.cos(0.53), 0.0, -7.29e-5 * np.sin(0.53)])
    imu = make_imu(0.005, iewn, [0, 0, -G], 400)
    out, _ = mech.mechanize_scan(cfg(True, iewn), NavState.identity(), imu)
    np.testing.assert_allclose(out.p, 0, atol=1e-7)
    np.testing.assert_allclose(out.v, 0, atol=1e-7)
    np.testing.assert_allclose(out.q, [0, 0, 0, 1], atol=1e-7)


def test_zero_velocity_detection():
    rng = np.random.default_rng(0)
    n, dt, rate = 200, 0.005, 200.0
    dtheta = rng.normal(0, 1e-6, (n, 3))
    dvel = np.tile([0, 0, -G * dt], (n, 1)) + rng.normal(0, 1e-5, (n, 3))
    is_zero, mth, mdv = mech.detect_zero_velocity(
        jnp.asarray(dtheta), jnp.asarray(dvel), jnp.ones(n), rate
    )
    assert bool(is_zero)
    np.testing.assert_allclose(mdv * rate, [0, 0, -G], atol=1e-2)

    # moving: large gyro variance
    dtheta2 = rng.normal(0, 1e-3, (n, 3))
    is_zero2, _, _ = mech.detect_zero_velocity(
        jnp.asarray(dtheta2), jnp.asarray(dvel), jnp.ones(n), rate
    )
    assert not bool(is_zero2)


def test_interpolate_pose():
    p0, p1 = jnp.zeros(3), jnp.array([2.0, 4.0, 6.0])
    q0 = quat.identity()
    q1 = quat.from_rotvec(jnp.array([0.0, 0.0, 0.4]))
    p, q = mech.interpolate_pose(p0, q0, 0.0, p1, q1, 1.0, 0.25)
    np.testing.assert_allclose(p, [0.5, 1.0, 1.5], atol=1e-12)
    q_expect = quat.from_rotvec(jnp.array([0.0, 0.0, 0.1]))
    np.testing.assert_allclose(np.abs(np.dot(np.asarray(q), np.asarray(q_expect))), 1.0, atol=1e-9)


def test_parallel_matches_sequential():
    """The log-depth prefix-scan formulation must reproduce the sequential
    lax.scan step-for-step (up to f64 reassociation) on a rough random
    trajectory, with and without earth terms and with a dual-sample anchor."""
    r = np.random.default_rng(7)
    n = 97
    imu = ImuBatch(
        time=jnp.asarray(0.005 * (np.arange(n) + 1)),
        dt=jnp.full(n, 0.005),
        dtheta=jnp.asarray(r.normal(0, 2e-3, (n, 3))),
        dvel=jnp.asarray(r.normal(0, 5e-2, (n, 3))),
        odovel=jnp.zeros(n),
    )
    state = NavState.identity()._replace(
        p=jnp.asarray(r.normal(0, 5, 3)),
        v=jnp.asarray(r.normal(0, 2, 3)),
        q=jnp.asarray(quat.normalize(jnp.asarray(r.normal(0, 1, 4)))),
        bg=jnp.asarray(r.normal(0, 1e-4, 3)),
        ba=jnp.asarray(r.normal(0, 1e-3, 3)),
    )
    prev = (jnp.asarray(0.005), jnp.asarray(r.normal(0, 2e-3, 3)),
            jnp.asarray(r.normal(0, 5e-2, 3)))
    for c in (cfg(), cfg(with_earth=True, iewn=[1e-5, 0, -5e-5])):
        o_par, tr_par = mech.mechanize_scan(c, state, imu, imu_prev=prev)
        o_seq, tr_seq = mech.mechanize_scan_seq(c, state, imu, imu_prev=prev)
        np.testing.assert_allclose(o_par.p, o_seq.p, atol=1e-10)
        np.testing.assert_allclose(o_par.v, o_seq.v, atol=1e-10)
        np.testing.assert_allclose(o_par.q, o_seq.q, atol=1e-12)
        for a, b in zip(tr_par, tr_seq):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)
