"""WGS-84 earth model: gravity, frames, BLH/ECEF/local-frame transforms.

Behavioral parity with /root/reference/ic_gvins/ic_gvins/common/earth.h:34-248
(constants, Somigliana-style normal gravity, cne/qne frames, local<->global
point and pose transforms, earth-rotation rate iewn, transport rate enwn).

All functions are pure jnp (f64) and batch under vmap. ``ecef2blh`` replaces
the reference's data-dependent while-loop with a fixed 10-iteration
``fori_loop`` (converges to <0.1 mm well before that for |h| < 100 km),
keeping the function jit-compilable with static shapes.
"""

import jax
import jax.numpy as jnp

WGS84_WIE = 7.2921151467e-5   # earth rotation rate, rad/s
WGS84_F = 0.0033528106647474805
WGS84_RA = 6378137.0
WGS84_RB = 6356752.3142451793
WGS84_GM0 = 398600441800000.0
WGS84_E1 = 0.0066943799901413156  # first eccentricity squared
WGS84_E2 = 0.0067394967422764341  # second eccentricity squared


def gravity(blh):
    """Normal gravity at geodetic position blh = (lat, lon, height)."""
    sin2 = jnp.sin(blh[..., 0]) ** 2
    return (
        9.7803267715 * (1 + 0.0052790414 * sin2 + 0.0000232718 * sin2 * sin2)
        + blh[..., 2] * (0.0000000043977311 * sin2 - 0.0000030876910891)
        + 0.0000000000007211 * blh[..., 2] ** 2
    )


def meridian_prime_vertical_radius(lat):
    """(RM, RN): meridian and prime-vertical radii of curvature."""
    tmp = 1.0 - WGS84_E1 * jnp.sin(lat) ** 2
    sqrttmp = jnp.sqrt(tmp)
    rm = WGS84_RA * (1 - WGS84_E1) / (sqrttmp * tmp)
    rn = WGS84_RA / sqrttmp
    return jnp.stack([rm, rn], axis=-1)


def rn(lat):
    sinlat = jnp.sin(lat)
    return WGS84_RA / jnp.sqrt(1.0 - WGS84_E1 * sinlat * sinlat)


def cne(blh):
    """DCM from n-frame (NED) to e-frame at blh."""
    sinlat, coslat = jnp.sin(blh[..., 0]), jnp.cos(blh[..., 0])
    sinlon, coslon = jnp.sin(blh[..., 1]), jnp.cos(blh[..., 1])
    row0 = jnp.stack([-sinlat * coslon, -sinlon, -coslat * coslon], axis=-1)
    row1 = jnp.stack([-sinlat * sinlon, coslon, -coslat * sinlon], axis=-1)
    row2 = jnp.stack([coslat, jnp.zeros_like(coslat), -sinlat], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def blh2ecef(blh):
    coslat, sinlat = jnp.cos(blh[..., 0]), jnp.sin(blh[..., 0])
    coslon, sinlon = jnp.cos(blh[..., 1]), jnp.sin(blh[..., 1])
    rn_ = rn(blh[..., 0])
    rnh = rn_ + blh[..., 2]
    return jnp.stack(
        [rnh * coslat * coslon, rnh * coslat * sinlon, (rnh - rn_ * WGS84_E1) * sinlat], axis=-1
    )


def ecef2blh(ecef):
    """Iterative ECEF -> geodetic, fixed 10 iterations (earth.h:132-150)."""
    p = jnp.sqrt(ecef[..., 0] ** 2 + ecef[..., 1] ** 2)
    lon = 2.0 * jnp.arctan2(ecef[..., 1], ecef[..., 0] + p)
    lat0 = jnp.arctan(ecef[..., 2] / (p * (1.0 - WGS84_E1)))
    h0 = jnp.zeros_like(p)

    def body(_, carry):
        lat, h = carry
        rn_ = rn(lat)
        h_new = p / jnp.cos(lat) - rn_
        lat_new = jnp.arctan(ecef[..., 2] / (p * (1.0 - WGS84_E1 * rn_ / (rn_ + h_new))))
        return (lat_new, h_new)

    lat, h = jax.lax.fori_loop(0, 10, body, (lat0, h0))
    return jnp.stack([lat, lon, h], axis=-1)


def local2global(origin, local):
    """n-frame point at `origin` -> geodetic BLH (earth.h:174-183)."""
    ecef0 = blh2ecef(origin)
    cn0e = cne(origin)
    ecef1 = ecef0 + jnp.einsum("...ij,...j->...i", cn0e, local)
    return ecef2blh(ecef1)


def global2local(origin, global_blh):
    """Geodetic BLH -> n-frame point at `origin` (earth.h:185-192)."""
    ecef0 = blh2ecef(origin)
    cn0e = cne(origin)
    ecef1 = blh2ecef(global_blh)
    return jnp.einsum("...ji,...j->...i", cn0e, ecef1 - ecef0)


def local2global_pose(origin, R_local, t_local):
    """Local pose -> (blh, R_global) (earth.h:194-208)."""
    ecef0 = blh2ecef(origin)
    cn0e = cne(origin)
    ecef1 = ecef0 + cn0e @ t_local
    blh1 = ecef2blh(ecef1)
    cn1e = cne(blh1)
    return blh1, cn1e.T @ cn0e @ R_local


def global2local_pose(origin, R_global, blh):
    """Global pose -> (R_local, t_local) (earth.h:210-223)."""
    ecef0 = blh2ecef(origin)
    cn0e = cne(origin)
    ecef1 = blh2ecef(blh)
    cn1e = cne(blh)
    return cn0e.T @ cn1e @ R_global, cn0e.T @ (ecef1 - ecef0)


def iewn_at_lat(lat):
    """Earth rotation rate in the n-frame at latitude."""
    return jnp.stack([WGS84_WIE * jnp.cos(lat), jnp.zeros_like(lat), -WGS84_WIE * jnp.sin(lat)], axis=-1)


def iewn(origin, local):
    """Earth rotation rate at a local position w.r.t. origin (earth.h:233-237)."""
    g = local2global(origin, local)
    return iewn_at_lat(g[..., 0])


def enwn(origin, local, vel):
    """Transport rate at local position (earth.h:239-248)."""
    g = local2global(origin, local)
    rmn = meridian_prime_vertical_radius(g[..., 0])
    rm, rn_ = rmn[..., 0], rmn[..., 1]
    lat, h = g[..., 0], g[..., 2]
    return jnp.stack(
        [
            vel[..., 1] / (rn_ + h),
            -vel[..., 0] / (rm + h),
            -vel[..., 1] * jnp.tan(lat) / (rn_ + h),
        ],
        axis=-1,
    )
