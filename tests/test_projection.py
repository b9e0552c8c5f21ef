"""Polar stereographic projection tests (vs. analytic properties and the
mapx formulation it replaces, reference contrib/mapx/src/polar_stereographic.c)."""

import numpy as np
import pytest

from nextsim_tpu.grid.projection import NPS_NEXTSIM, PolarStereo


def test_roundtrip():
    p = NPS_NEXTSIM
    lat = np.array([85.0, 75.0, 65.0, 45.0])
    lon = np.array([0.0, -45.0, 120.0, -170.0])
    x, y = p.forward(lat, lon)
    lat2, lon2 = p.inverse(np.asarray(x), np.asarray(y))
    np.testing.assert_allclose(np.asarray(lat2), lat, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lon2), lon, atol=1e-6)


def test_pole_is_origin():
    x, y = NPS_NEXTSIM.forward(90.0, 0.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6


def test_central_meridian_axis():
    # a point on the central meridian maps onto the -y axis (mapx convention:
    # x = rho sin(lam), y = -rho cos(lam), lam = lon - lon0)
    x, y = NPS_NEXTSIM.forward(70.0, NPS_NEXTSIM.lon0)
    assert abs(float(x)) < 1e-6
    assert float(y) < 0


def test_true_scale_at_60N():
    # scale factor ~1 at lat_ts: distance of 0.1 deg lat along meridian ≈ arc length
    p = NPS_NEXTSIM
    lat = np.array([59.95, 60.05])
    lon = np.array([p.lon0, p.lon0])
    x, y = p.forward(lat, lon)
    dist = np.hypot(np.diff(np.asarray(x)), np.diff(np.asarray(y)))[0]
    # meridional arc on the ellipsoid at 60N
    e2 = p.ecc**2
    phi = np.deg2rad(60.0)
    M = p.a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    expected = M * np.deg2rad(0.1)
    assert abs(dist - expected) / expected < 1e-4


def test_known_point_nsidc():
    # North pole at origin; (lat_ts, lon0+90) must map to (+rho, 0)
    p = PolarStereo(lat0=90, lat_ts=70, lon0=-45)
    x, y = p.forward(70.0, 45.0)
    assert float(x) > 0 and abs(float(y)) < 1e-6
