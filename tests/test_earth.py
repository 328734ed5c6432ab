import jax.numpy as jnp
import numpy as np

from ic_gvins_tpu.core import earth


WUHAN = jnp.array([np.deg2rad(30.528), np.deg2rad(114.356), 40.0])


def test_gravity_range():
    g_equator = earth.gravity(jnp.array([0.0, 0.0, 0.0]))
    g_pole = earth.gravity(jnp.array([np.pi / 2, 0.0, 0.0]))
    assert 9.779 < float(g_equator) < 9.781
    assert 9.83 < float(g_pole) < 9.834
    # altitude decreases gravity
    g_high = earth.gravity(jnp.array([0.0, 0.0, 1000.0]))
    assert float(g_high) < float(g_equator)


def test_blh_ecef_roundtrip():
    blh = earth.ecef2blh(earth.blh2ecef(WUHAN))
    np.testing.assert_allclose(blh, WUHAN, atol=1e-9)


def test_ecef_known_point():
    # equator, prime meridian, h=0 -> (a, 0, 0)
    ecef = earth.blh2ecef(jnp.array([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(ecef, [earth.WGS84_RA, 0.0, 0.0], atol=1e-6)
    # north pole -> z = b
    ecef = earth.blh2ecef(jnp.array([np.pi / 2, 0.0, 0.0]))
    np.testing.assert_allclose(ecef[2], earth.WGS84_RB, atol=1e-6)


def test_cne_orthonormal():
    C = earth.cne(WUHAN)
    np.testing.assert_allclose(C @ C.T, jnp.eye(3), atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(C), 1.0, atol=1e-12)


def test_local_global_roundtrip():
    local = jnp.array([1234.5, -987.6, 45.0])
    blh = earth.local2global(WUHAN, local)
    back = earth.global2local(WUHAN, blh)
    np.testing.assert_allclose(back, local, atol=1e-6)


def test_local_north_displacement():
    # 1000 m north should raise latitude by ~1000/RM rad
    local = jnp.array([1000.0, 0.0, 0.0])
    blh = earth.local2global(WUHAN, local)
    rmn = earth.meridian_prime_vertical_radius(WUHAN[0])
    expected_dlat = 1000.0 / (float(rmn[0]) + float(WUHAN[2]))
    np.testing.assert_allclose(float(blh[0] - WUHAN[0]), expected_dlat, rtol=1e-3)


def test_iewn():
    w = earth.iewn_at_lat(WUHAN[0])
    np.testing.assert_allclose(jnp.linalg.norm(w), earth.WGS84_WIE, atol=1e-12)
    # at the equator the rate is all-north
    w_eq = earth.iewn_at_lat(0.0)
    np.testing.assert_allclose(w_eq, [earth.WGS84_WIE, 0, 0], atol=1e-18)


def test_pose_transforms_roundtrip():
    R = np.asarray(earth.cne(jnp.array([0.1, 0.2, 0.0])))  # any rotation matrix
    t = jnp.array([100.0, 200.0, -50.0])
    blh, Rg = earth.local2global_pose(WUHAN, jnp.asarray(R), t)
    Rl, tl = earth.global2local_pose(WUHAN, Rg, blh)
    np.testing.assert_allclose(Rl, R, atol=1e-9)
    np.testing.assert_allclose(tl, t, atol=1e-6)


def test_earth_np_parity():
    """The host-path numpy twin (core/earth_np.py) must match the jnp module
    exactly — the replay feeds earth_np results straight into jitted device
    programs that were validated against core/earth.py."""
    from ic_gvins_tpu.core import earth_np

    rng = np.random.default_rng(7)
    origins = np.stack(
        [rng.uniform(-1.4, 1.4, 8), rng.uniform(-3.1, 3.1, 8), rng.uniform(-100, 5000, 8)],
        axis=1,
    )
    locals_ = rng.uniform(-2e4, 2e4, (8, 3))
    for o, l in zip(origins, locals_):
        np.testing.assert_allclose(earth_np.gravity(o), float(earth.gravity(jnp.asarray(o))), rtol=0, atol=1e-12)
        np.testing.assert_allclose(earth_np.cne(o), earth.cne(jnp.asarray(o)), atol=1e-15)
        np.testing.assert_allclose(earth_np.blh2ecef(o), earth.blh2ecef(jnp.asarray(o)), atol=1e-8)
        np.testing.assert_allclose(
            earth_np.global2local(o, o + 1e-4), earth.global2local(jnp.asarray(o), jnp.asarray(o + 1e-4)), atol=1e-8)
        np.testing.assert_allclose(
            earth_np.local2global(o, l), earth.local2global(jnp.asarray(o), jnp.asarray(l)), atol=1e-12)
        np.testing.assert_allclose(
            earth_np.iewn(o, l), earth.iewn(jnp.asarray(o), jnp.asarray(l)), rtol=0, atol=1e-18)
