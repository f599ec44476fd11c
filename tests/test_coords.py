# -*- coding: utf-8 -*-
"""
Native projection engine (coords/, the pyproj replacement) against
independent oracles: the transverse-Mercator meridian arc by direct
numerical integration of the ellipsoid integrand, first-order scale
behaviour at projection origins, and forward/inverse round-trips.

"""

import numpy as np
import pytest

from quakemigrate_tpu.coords import Proj, Transformer

WGS84_A = 6378137.0
WGS84_F = 1 / 298.257223563
E2 = WGS84_F * (2 - WGS84_F)


def meridian_arc(lat_deg, n=200_001):
    """Meridian arc length from the equator by Simpson integration of
    M(phi) = a (1-e^2) / (1 - e^2 sin^2 phi)^(3/2)."""

    phi = np.linspace(0.0, np.radians(lat_deg), n)
    integrand = WGS84_A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5
    h = phi[1] - phi[0]
    weights = np.ones(n)
    weights[1:-1:2] = 4.0
    weights[2:-1:2] = 2.0
    return h / 3 * (weights * integrand).sum()


def test_tmerc_central_meridian_is_scaled_meridian_arc():
    proj = Proj(proj="tmerc", lon_0=15.0, lat_0=0.0, k_0=0.9996,
                ellps="WGS84", datum="WGS84")
    for lat in (10.0, 45.0, 70.0):
        x, y = proj.forward(15.0, lat)
        assert abs(x) < 1e-6
        np.testing.assert_allclose(y, 0.9996 * meridian_arc(lat), rtol=1e-9)


def test_utm_anchor_points():
    """UTM zone 31N: the central meridian maps to easting 500 km, and a
    small equatorial offset scales by k0 * a (the equator's curvature
    radius in the prime-vertical is a)."""

    proj = Proj(proj="utm", zone=31, ellps="WGS84", datum="WGS84")
    x, y = proj.forward(3.0, 0.0)
    np.testing.assert_allclose(x, 500_000.0, atol=1e-6)
    np.testing.assert_allclose(y, 0.0, atol=1e-6)

    dlam = np.radians(0.01)
    x1, _ = proj.forward(3.01, 0.0)
    np.testing.assert_allclose(
        x1 - 500_000.0, 0.9996 * WGS84_A * dlam, rtol=1e-6
    )


def test_lcc_unit_scale_at_standard_parallels():
    """A secant Lambert conic has scale exactly 1 along its standard
    parallels: projected distance along the parallel == true distance."""

    lat1, lat2 = 64.0, 65.5
    proj = Proj(proj="lcc", lon_0=-17.0, lat_0=64.75, lat_1=lat1,
                lat_2=lat2, ellps="WGS84", datum="WGS84")
    dlam = 1e-4  # degrees
    for lat in (lat1, lat2):
        x0, y0 = proj.forward(-17.0, lat)
        x1, y1 = proj.forward(-17.0 + dlam, lat)
        projected = np.hypot(x1 - x0, y1 - y0)
        # True distance along the parallel: nu * cos(phi) * dlambda
        phi = np.radians(lat)
        nu = WGS84_A / np.sqrt(1 - E2 * np.sin(phi) ** 2)
        true = nu * np.cos(phi) * np.radians(dlam)
        np.testing.assert_allclose(projected, true, rtol=1e-7)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(proj="tmerc", lon_0=-17.2, lat_0=64.3, k_0=0.9996),
        dict(proj="lcc", lon_0=-17.2, lat_0=64.3, lat_1=64.2, lat_2=64.4),
        dict(proj="utm", zone=28),
        dict(proj="aeqd", lon_0=-17.2, lat_0=64.3),
    ],
)
def test_forward_inverse_roundtrip(kwargs):
    proj = Proj(ellps="WGS84", datum="WGS84", **kwargs)
    rng = np.random.default_rng(3)
    lons = -17.2 + rng.uniform(-2, 2, 50)
    lats = 64.3 + rng.uniform(-2, 2, 50)
    x, y = proj.forward(lons, lats)
    lon2, lat2 = proj.inverse(x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)


def test_km_units_scale_coordinates():
    m = Proj(proj="tmerc", lon_0=0.0, lat_0=0.0, units="m")
    km = Proj(proj="tmerc", lon_0=0.0, lat_0=0.0, units="km")
    xm, ym = m.forward(0.5, 0.5)
    xk, yk = km.forward(0.5, 0.5)
    np.testing.assert_allclose((xm, ym), (xk * 1000, yk * 1000), rtol=1e-12)


def test_transformer_longlat_to_grid():
    gproj = Proj(proj="lcc", units="km", lon_0=-17.2, lat_0=64.3,
                 lat_1=64.2, lat_2=64.4)
    cproj = Proj(proj="longlat")
    t = Transformer.from_proj(cproj, gproj)
    back = Transformer.from_proj(gproj, cproj)
    x, y = t.transform(-17.25, 64.33)
    lon, lat = back.transform(x, y)
    np.testing.assert_allclose((lon, lat), (-17.25, 64.33), atol=1e-9)
