"""Pure-numpy twin of the host-hot subset of core/earth.py.

The replay loop needs scalar WGS-84 evaluations (iewn feedback per frame,
per-segment earth rate, GNSS global->local) on the HOST between device
dispatches. Calling the jnp versions eagerly costs dozens of per-op
dispatches (~100 ms/frame measured on the earth-enabled replay); these
numpy versions are semantically identical (same constants/formulas,
earth.h:34-248) and cost microseconds. Parity with the jnp module is gated
by tests/test_earth.py.
"""

import numpy as np

from .earth import (  # noqa: F401  (shared constants)
    WGS84_E1,
    WGS84_F,
    WGS84_GM0,
    WGS84_RA,
    WGS84_RB,
    WGS84_WIE,
)


def gravity(blh):
    """Normal gravity at geodetic blh = (lat, lon, height) (earth.h:70-79)."""
    blh = np.asarray(blh, np.float64)
    sin2 = np.sin(blh[..., 0]) ** 2
    return (
        9.7803267715 * (1 + 0.0052790414 * sin2 + 0.0000232718 * sin2 * sin2)
        + blh[..., 2] * (0.0000000043977311 * sin2 - 0.0000030876910891)
        + 0.0000000000007211 * blh[..., 2] ** 2
    )


def rn(lat):
    sinlat = np.sin(lat)
    return WGS84_RA / np.sqrt(1.0 - WGS84_E1 * sinlat * sinlat)


def cne(blh):
    blh = np.asarray(blh, np.float64)
    sinlat, coslat = np.sin(blh[..., 0]), np.cos(blh[..., 0])
    sinlon, coslon = np.sin(blh[..., 1]), np.cos(blh[..., 1])
    row0 = np.stack([-sinlat * coslon, -sinlon, -coslat * coslon], axis=-1)
    row1 = np.stack([-sinlat * sinlon, coslon, -coslat * sinlon], axis=-1)
    row2 = np.stack([coslat, np.zeros_like(coslat), -sinlat], axis=-1)
    return np.stack([row0, row1, row2], axis=-2)


def blh2ecef(blh):
    blh = np.asarray(blh, np.float64)
    coslat, sinlat = np.cos(blh[..., 0]), np.sin(blh[..., 0])
    coslon, sinlon = np.cos(blh[..., 1]), np.sin(blh[..., 1])
    rn_ = rn(blh[..., 0])
    rnh = rn_ + blh[..., 2]
    return np.stack(
        [rnh * coslat * coslon, rnh * coslat * sinlon, (rnh - rn_ * WGS84_E1) * sinlat],
        axis=-1,
    )


def ecef2blh(ecef):
    """Iterative ECEF -> geodetic; fixed 10 iterations to match the jnp
    version bit-for-bit (earth.py:69-84, earth.h:132-150)."""
    ecef = np.asarray(ecef, np.float64)
    p = np.sqrt(ecef[..., 0] ** 2 + ecef[..., 1] ** 2)
    lon = 2.0 * np.arctan2(ecef[..., 1], ecef[..., 0] + p)
    lat = np.arctan(ecef[..., 2] / (p * (1.0 - WGS84_E1)))
    h = np.zeros_like(p)
    for _ in range(10):
        rn_ = rn(lat)
        h = p / np.cos(lat) - rn_
        lat = np.arctan(ecef[..., 2] / (p * (1.0 - WGS84_E1 * rn_ / (rn_ + h))))
    return np.stack([lat, lon, h], axis=-1)


def local2global(origin, local):
    ecef0 = blh2ecef(origin)
    cn0e = cne(origin)
    ecef1 = ecef0 + np.einsum("...ij,...j->...i", cn0e, np.asarray(local, np.float64))
    return ecef2blh(ecef1)


def global2local(origin, global_blh):
    ecef0 = blh2ecef(origin)
    cn0e = cne(origin)
    ecef1 = blh2ecef(global_blh)
    return np.einsum("...ji,...j->...i", cn0e, ecef1 - ecef0)


def iewn_at_lat(lat):
    lat = np.asarray(lat, np.float64)
    return np.stack(
        [WGS84_WIE * np.cos(lat), np.zeros_like(lat), -WGS84_WIE * np.sin(lat)],
        axis=-1,
    )


def iewn(origin, local):
    g = local2global(origin, local)
    return iewn_at_lat(g[..., 0])
