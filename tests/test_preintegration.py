import jax
import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core.types import ImuBatch, IntegrationParams, NavState
from ic_gvins_tpu.core import quaternion as quat
from ic_gvins_tpu.ins import mechanization as mech
from ic_gvins_tpu.ins import preintegration as pre


G = 9.8


def make_imu(n, dt=0.005, seed=0, t0=0.0):
    rng = np.random.default_rng(seed)
    # smooth-ish motion: rotation rates ~0.2 rad/s, accel ~1 m/s2 + gravity reaction
    w = rng.normal(0, 0.2, (n, 3))
    f = rng.normal(0, 1.0, (n, 3)) + np.array([0, 0, -G])
    return ImuBatch(
        time=jnp.asarray(t0 + dt * np.arange(n)),
        dt=jnp.concatenate([jnp.zeros(1), jnp.full(n - 1, dt)]),
        dtheta=jnp.asarray(w * dt),
        dvel=jnp.asarray(f * dt),
        odovel=jnp.zeros(n),
    )


def params():
    return IntegrationParams.default()._replace(gravity=jnp.asarray(G))


def start_state(seed=3):
    rng = np.random.default_rng(seed)
    return NavState.identity()._replace(
        p=jnp.asarray(rng.normal(0, 10, 3)),
        q=quat.from_rotvec(jnp.asarray(rng.normal(0, 0.5, 3))),
        v=jnp.asarray(rng.normal(0, 2, 3)),
        bg=jnp.asarray(rng.normal(0, 1e-3, 3)),
        ba=jnp.asarray(rng.normal(0, 1e-2, 3)),
    )


def test_abs_state_matches_mechanization():
    """The preintegration's running absolute state must equal plain INS
    mechanization over the same samples (they implement the same strapdown)."""
    imu = make_imu(101)
    st = start_state()
    summ = pre.preintegrate(params(), imu, st, with_earth=False)
    cfg = mech.MechConfig(gravity=jnp.array([0, 0, G]), iewn=jnp.zeros(3), iswithearth=False)
    out, _ = mech.mechanize_scan(
        cfg,
        st,
        ImuBatch(imu.time[1:], imu.dt[1:], imu.dtheta[1:], imu.dvel[1:], imu.odovel[1:]),
        imu_prev=(imu.dt[0], imu.dtheta[0] - imu.dt[0] * st.bg, imu.dvel[0] - imu.dt[0] * st.ba),
    )
    np.testing.assert_allclose(summ.end_p, out.p, atol=1e-10)
    np.testing.assert_allclose(summ.end_v, out.v, atol=1e-10)
    assert abs(float(jnp.abs(jnp.dot(summ.end_q, out.q))) - 1.0) < 1e-10


def test_abs_state_matches_mechanization_earth():
    imu = make_imu(101)
    st = start_state()
    iewn = jnp.array([6e-5, 0.0, -4e-5])
    summ = pre.preintegrate(params(), imu, st, with_earth=True, iewn=iewn)
    cfg = mech.MechConfig(gravity=jnp.array([0, 0, G]), iewn=iewn, iswithearth=True)
    out, _ = mech.mechanize_scan(
        cfg,
        st,
        ImuBatch(imu.time[1:], imu.dt[1:], imu.dtheta[1:], imu.dvel[1:], imu.odovel[1:]),
        imu_prev=(imu.dt[0], imu.dtheta[0] - imu.dt[0] * st.bg, imu.dvel[0] - imu.dt[0] * st.ba),
    )
    np.testing.assert_allclose(summ.end_p, out.p, atol=1e-10)
    np.testing.assert_allclose(summ.end_v, out.v, atol=1e-10)
    assert abs(float(jnp.abs(jnp.dot(summ.end_q, out.q))) - 1.0) < 1e-10


def test_delta_gravity_free():
    """For zero bias and identity start, delta == absolute minus gravity: with
    gravity-free inputs the delta equals the absolute integration at g=0."""
    imu = make_imu(101, seed=5)
    st = NavState.identity()
    summ = pre.preintegrate(params(), imu, st, with_earth=False)
    p0 = params()._replace(gravity=jnp.asarray(0.0))
    summ0 = pre.preintegrate(p0, imu, st, with_earth=False)
    np.testing.assert_allclose(summ.dp, summ0.end_p, atol=1e-10)
    np.testing.assert_allclose(summ.dv, summ0.end_v, atol=1e-10)
    assert abs(float(jnp.abs(jnp.dot(summ.dq, summ0.end_q))) - 1.0) < 1e-12


def test_padding_invariance():
    imu = make_imu(64, seed=7)
    st = start_state(9)
    pad = 32
    padded = ImuBatch(
        time=jnp.concatenate([imu.time, jnp.zeros(pad)]),
        dt=jnp.concatenate([imu.dt, jnp.zeros(pad)]),
        dtheta=jnp.concatenate([imu.dtheta, jnp.zeros((pad, 3))]),
        dvel=jnp.concatenate([imu.dvel, jnp.zeros((pad, 3))]),
        odovel=jnp.concatenate([imu.odovel, jnp.zeros(pad)]),
    )
    s1 = pre.preintegrate(params(), imu, st, with_earth=False)
    s2 = pre.preintegrate(params(), padded, st, with_earth=False)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_bias_jacobian_finite_difference():
    """The chained analytic bias jacobians (the reference's phi-product
    construction) must agree with the true derivative of the re-integrated
    deltas. The phi-chaining is itself a first-order discretization (the
    position row drops the current step's 0.5*dt*d(dvel)/dbias term), so the
    analytic blocks match the exact derivative only to a few percent — we
    check the exact derivative against finite differences tightly (validates
    the integrator), and the analytic blocks loosely (validates that they are
    the same first-order construction as the reference)."""
    imu = make_imu(51, seed=11)
    st = start_state(13)
    summ = pre.preintegrate(params(), imu, st, with_earth=False)

    def deltas(bg, ba):
        s = st._replace(bg=bg, ba=ba)
        out = pre.preintegrate(params(), imu, s, with_earth=False)
        return jnp.concatenate([out.dp, out.dv, quat.to_rotvec(quat.mul(quat.conj(summ.dq), out.dq))])

    J_bg = jax.jacfwd(lambda bg: deltas(bg, st.ba))(st.bg)
    J_ba = jax.jacfwd(lambda ba: deltas(st.bg, ba))(st.ba)

    # exact autodiff vs central finite differences (integrator correctness)
    eps = 1e-6
    for axis in range(3):
        d = jnp.zeros(3).at[axis].set(eps)
        fd = (deltas(st.bg + d, st.ba) - deltas(st.bg - d, st.ba)) / (2 * eps)
        np.testing.assert_allclose(J_bg[:, axis], fd, atol=1e-6)

    # analytic phi-chained blocks vs exact derivative: same to first order
    def rel_close(analytic, exact, tol):
        scale = max(1.0, float(np.abs(np.asarray(exact)).max()))
        np.testing.assert_allclose(np.asarray(analytic), np.asarray(exact), atol=tol * scale)

    rel_close(summ.dp_dbg, J_bg[0:3], 0.05)
    rel_close(summ.dv_dbg, J_bg[3:6], 0.05)
    rel_close(summ.dq_dbg, J_bg[6:9], 0.05)
    rel_close(summ.dp_dba, J_ba[0:3], 0.05)
    rel_close(summ.dv_dba, J_ba[3:6], 0.05)


def test_covariance_psd_and_growth():
    imu = make_imu(201, seed=17)
    st = start_state(19)
    summ = pre.preintegrate(params(), imu, st, with_earth=False)
    w = np.linalg.eigvalsh(np.asarray(summ.cov))
    assert w.min() > -1e-18
    # half the interval has smaller position variance
    half = ImuBatch(imu.time[:101], imu.dt[:101], imu.dtheta[:101], imu.dvel[:101], imu.odovel[:101])
    summ_h = pre.preintegrate(params(), half, st, with_earth=False)
    assert float(jnp.trace(summ.cov[:3, :3])) > float(jnp.trace(summ_h.cov[:3, :3]))
    # whitener consistency: U^T U == cov^-1
    utu = np.asarray(summ.sqrt_info.T @ summ.sqrt_info)
    np.testing.assert_allclose(utu, np.linalg.inv(np.asarray(summ.cov)), rtol=1e-5)


def test_vmap_batch():
    imus = [make_imu(64, seed=s) for s in range(4)]
    batch = ImuBatch(*[jnp.stack([getattr(i, f) for i in imus]) for f in ImuBatch._fields])
    sts = [start_state(s) for s in range(4)]
    stb = NavState(*[jnp.stack([getattr(s, f) for s in sts]) for f in NavState._fields])
    out = pre.preintegrate_batch(params(), batch, stb, with_earth=False)
    single = pre.preintegrate(params(), imus[2], sts[2], with_earth=False)
    np.testing.assert_allclose(out.dp[2], single.dp, atol=1e-12)
    np.testing.assert_allclose(out.cov[2], single.cov, atol=1e-12)


def test_parallel_matches_sequential_field_by_field():
    """Direct regression gate: the log-depth prefix-scan formulation
    (preintegrate / ins/parallel_scan.py) must equal the sequential oracle
    (preintegrate_seq) on EVERY PreintSummary field — normal + earth
    variants, with zero-padded tails (ADVICE r2)."""
    iewn = jnp.asarray([0.0, 5.5e-5, 4.8e-5])
    for with_earth, seed in ((False, 5), (True, 6)):
        imu = make_imu(97, seed=seed)
        # zero-pad the tail: padded samples must be exact no-ops in both
        pad = ImuBatch(
            time=jnp.concatenate([imu.time, jnp.zeros(31)]),
            dt=jnp.concatenate([imu.dt, jnp.zeros(31)]),
            dtheta=jnp.concatenate([imu.dtheta, jnp.zeros((31, 3))]),
            dvel=jnp.concatenate([imu.dvel, jnp.zeros((31, 3))]),
            odovel=jnp.concatenate([imu.odovel, jnp.zeros(31)]),
        )
        st = start_state(seed + 10)
        kw = dict(with_earth=with_earth, iewn=iewn if with_earth else None)
        par = pre.preintegrate(params(), pad, st, **kw)
        seq = pre.preintegrate_seq(params(), pad, st, **kw)
        for field in par._fields:
            a, b = np.asarray(getattr(par, field)), np.asarray(getattr(seq, field))
            if field in ("dq", "end_q"):
                assert abs(abs(float(np.dot(a, b))) - 1.0) < 1e-12, field
                continue
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(
                a, b, atol=1e-9 * scale, err_msg=f"{field} (earth={with_earth})")
