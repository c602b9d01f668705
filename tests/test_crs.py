"""Closed-form CRS transforms (homonim_spark.crs): round-trip exactness,
known geodetic anchors, and dispatch."""

import numpy as np
import pytest

from homonim_spark import crs


def test_utm_round_trips_machine_precision():
    cases = [(18, False, -73.5, 40.5), (31, False, 3.2, 50.8),
             (34, True, 18.43, -33.9), (30, False, -0.4, 51.5)]
    for zone, south, lon, lat in cases:
        x, y = crs.lonlat_to_utm(np.array([lon]), np.array([lat]), zone, south)
        lo, la = crs.utm_to_lonlat(x, y, zone, south)
        assert abs(lo[0] - lon) < 1e-12 and abs(la[0] - lat) < 1e-12


def test_utm_meridian_arc_anchor():
    """At the central meridian the northing is k0 x the WGS84 meridian arc —
    the 45°N arc length is the published 4 984 944.4 m."""
    x, y = crs.lonlat_to_utm(np.array([3.0]), np.array([45.0]), 31)
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.9996 * 4984944.4, abs=0.5)


def test_utm_false_northing_south():
    x_n, y_n = crs.lonlat_to_utm(np.array([18.43]), np.array([-33.9]), 34, True)
    assert 0 < y_n[0] < 10000000.0  # south: false northing applied


def test_webmercator_round_trip_and_anchor():
    lon, lat = np.array([-73.5]), np.array([40.5])
    x, y = crs.lonlat_to_webmercator(lon, lat)
    # x = R·λ exactly
    assert x[0] == pytest.approx(6378137.0 * np.radians(-73.5), abs=1e-6)
    lo, la = crs.webmercator_to_lonlat(x, y)
    assert abs(lo[0] + 73.5) < 1e-12 and abs(la[0] - 40.5) < 1e-12


def test_transform_points_dispatch_and_identity():
    x, y = crs.transform_points("EPSG:4326", "EPSG:3857", -73.5, 40.5)
    x2, y2 = crs.lonlat_to_webmercator(-73.5, 40.5)
    assert np.allclose([x, y], [x2, y2])
    xi, yi = crs.transform_points("EPSG:3857", "EPSG:3857", 5.0, 7.0)
    assert (xi, yi) == (5.0, 7.0)
    # UTM id parsing
    xu, yu = crs.transform_points("EPSG:4326", "EPSG:32618", -73.5, 40.5)
    xu2, yu2 = crs.lonlat_to_utm(-73.5, 40.5, 18, False)
    assert np.allclose([xu, yu], [xu2, yu2])
    with pytest.raises(ValueError):
        crs.transform_points("EPSG:2193", "EPSG:4326", 0, 0)


def test_sinusoidal_round_trip_and_anchor():
    """MODIS sinusoidal (x = R·λ·cosφ on the R=6371007.181 authalic
    sphere): machine-precision round trips, the equatorial x = R·λ anchor,
    and the published MODIS grid half-width π·R ≈ 20 015 109.354 m."""
    R = 6371007.181
    for lon, lat in [(18.43, -33.9), (-73.5, 40.5), (0.0, 0.0), (120.0, 60.0)]:
        x, y = crs.lonlat_to_sinusoidal(np.array([lon]), np.array([lat]))
        lo, la = crs.sinusoidal_to_lonlat(x, y)
        assert abs(lo[0] - lon) < 1e-12 and abs(la[0] - lat) < 1e-12
    x, y = crs.lonlat_to_sinusoidal(np.array([90.0]), np.array([0.0]))
    assert x[0] == pytest.approx(R * np.pi / 2, abs=1e-6)
    assert y[0] == 0.0
    x180, _ = crs.lonlat_to_sinusoidal(np.array([180.0]), np.array([0.0]))
    assert x180[0] == pytest.approx(20015109.354, abs=0.01)


def test_sinusoidal_dispatch():
    for name in ("SINUSOIDAL", "SR-ORG:6974", "ESRI:54008"):
        x, y = crs.transform_points("EPSG:4326", name, 18.43, -33.9)
        x2, y2 = crs.lonlat_to_sinusoidal(18.43, -33.9)
        assert np.allclose([x, y], [x2, y2])
    # MODIS sinusoidal -> UTM 34S pivot (the reference tutorial's pairing)
    xs, ys = crs.lonlat_to_sinusoidal(18.43, -33.9)
    xu, yu = crs.transform_points("SINUSOIDAL", "EPSG:32734", xs, ys)
    xu2, yu2 = crs.lonlat_to_utm(18.43, -33.9, 34, True)
    assert np.allclose([xu, yu], [xu2, yu2])


def test_lcc_center_anchor_and_round_trip():
    """LCC-2SP: the projection origin maps to the false origin exactly;
    round trips are machine precision across each grid's domain."""
    x, y = crs.lonlat_to_lcc(3.0, 46.5, 2154)       # Lambert-93 origin
    assert x == pytest.approx(700000.0, abs=1e-6)
    assert y == pytest.approx(6600000.0, abs=1e-6)
    x, y = crs.lonlat_to_lcc(-95.0, 49.0, 3978)     # Canada Atlas origin
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    for epsg, lons, lats in (
        (2154, np.linspace(-4, 9, 25), np.linspace(42, 51, 25)),
        (3978, np.linspace(-140, -50, 25), np.linspace(42, 83, 25)),
    ):
        X, Y = crs.lonlat_to_lcc(lons, lats, epsg)
        lo, la = crs.lcc_to_lonlat(X, Y, epsg)
        assert np.abs(lo - lons).max() < 1e-9
        assert np.abs(la - lats).max() < 1e-9


def test_lcc_unit_scale_on_standard_parallels():
    """The defining property of LCC-2SP: local scale factor is exactly 1
    along BOTH standard parallels (any error in n/F/t/m shows up here)."""
    e2 = crs._GRS80_F * (2 - crs._GRS80_F)
    for epsg, lon0, sps in ((2154, 3.0, (49.0, 44.0)),
                            (3978, -95.0, (49.0, 77.0))):
        for sp in sps:
            dlam = 1e-6
            x1, y1 = crs.lonlat_to_lcc(lon0, sp, epsg)
            x2, y2 = crs.lonlat_to_lcc(lon0 + dlam, sp, epsg)
            proj = np.hypot(x2 - x1, y2 - y1)
            s = np.sin(np.radians(sp))
            geod = (6378137.0 * np.cos(np.radians(sp))
                    / np.sqrt(1 - e2 * s * s) * np.radians(dlam))
            assert proj / geod == pytest.approx(1.0, abs=1e-8)


def test_lcc_known_value_paris_lambert93():
    """Published conversion: Paris (2.3522 E, 48.8566 N) in RGF93 /
    Lambert-93 is (652469.02, 6862035.26) — pins the full ellipsoidal
    formula chain against an external authority, not a round trip."""
    x, y = crs.lonlat_to_lcc(2.3522, 48.8566, 2154)
    assert x == pytest.approx(652469.02, abs=0.5)
    assert y == pytest.approx(6862035.26, abs=0.5)


def test_lcc_dispatch_and_cross_crs():
    x, y = crs.transform_points("EPSG:4326", "EPSG:2154", 2.3522, 48.8566)
    x2, y2 = crs.lonlat_to_lcc(2.3522, 48.8566, 2154)
    assert np.allclose([x, y], [x2, y2])
    # Lambert-93 -> UTM 31N via the lon/lat pivot
    xu, yu = crs.transform_points("EPSG:2154", "EPSG:32631", x, y)
    xu2, yu2 = crs.lonlat_to_utm(2.3522, 48.8566, 31, False)
    assert np.allclose([xu, yu], [xu2, yu2], atol=1e-6)


def test_polar_stereo_anchors_round_trip_and_scale():
    """Polar stereographic (EPSG:3413 north / 3031 south): the pole maps
    to the grid origin exactly, round trips are machine precision, local
    scale is exactly 1 on the true-scale parallel (the variant-B defining
    property), and the 3413 central meridian lands on the -y axis."""
    assert crs.lonlat_to_polar_stereo(0.0, 90.0, 3413) == (0.0, 0.0)
    assert crs.lonlat_to_polar_stereo(0.0, -90.0, 3031) == (0.0, 0.0)
    lon = np.linspace(-180, 179, 37)
    for epsg, lats in ((3413, np.linspace(60, 89, 37)),
                       (3031, np.linspace(-89, -60, 37))):
        X, Y = crs.lonlat_to_polar_stereo(lon, lats, epsg)
        lo, la = crs.polar_stereo_to_lonlat(X, Y, epsg)
        dl = (lo - lon + 180) % 360 - 180
        assert np.abs(dl).max() < 1e-9 and np.abs(la - lats).max() < 1e-9
    e2 = 0.00669437999014
    for epsg, ts in ((3413, 70.0), (3031, -71.0)):
        d = 1e-6
        x1, y1 = crs.lonlat_to_polar_stereo(10.0, ts, epsg)
        x2, y2 = crs.lonlat_to_polar_stereo(10.0 + d, ts, epsg)
        s = np.sin(np.radians(ts))
        geod = (6378137.0 * np.cos(np.radians(ts))
                / np.sqrt(1 - e2 * s * s) * np.radians(d))
        assert np.hypot(x2 - x1, y2 - y1) / geod == pytest.approx(
            1.0, abs=1e-8)
    x, y = crs.lonlat_to_polar_stereo(-45.0, 70.0, 3413)
    assert abs(x) < 1e-6
    assert y == pytest.approx(-2187927.65, abs=0.5)  # published ρ at 70N


def test_polar_stereo_dispatch():
    x, y = crs.transform_points("EPSG:4326", "EPSG:3031", 166.668, -77.846)
    x2, y2 = crs.lonlat_to_polar_stereo(166.668, -77.846, 3031)
    assert np.allclose([x, y], [x2, y2])
    lo, la = crs.transform_points("EPSG:3031", "EPSG:4326", x, y)
    assert np.allclose([lo, la], [166.668, -77.846])


def test_albers_anchor_round_trip_and_equal_area():
    """Albers equal-area conic (EPSG:5070 CONUS): origin → false origin
    exactly; machine-precision round trips; the projected area of an
    infinitesimal lon/lat patch equals the ellipsoidal surface element
    everywhere (THE defining property — any error in n/C/q breaks it);
    parallel scale is exactly 1 on both standard parallels."""
    assert crs.lonlat_to_albers(-96.0, 23.0, 5070) == (0.0, 0.0)
    lon = np.linspace(-125, -66, 30)
    lat = np.linspace(24, 49, 30)
    X, Y = crs.lonlat_to_albers(lon, lat, 5070)
    lo, la = crs.albers_to_lonlat(X, Y, 5070)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9

    a, e2 = 6378137.0, crs._GRS80_F * (2 - crs._GRS80_F)
    d = 1e-6
    for lonc, latc in [(-120, 35), (-96, 23), (-80, 45), (-70, 30)]:
        x0, y0 = crs.lonlat_to_albers(lonc, latc, 5070)
        x1, y1 = crs.lonlat_to_albers(lonc + d, latc, 5070)
        x2, y2 = crs.lonlat_to_albers(lonc, latc + d, 5070)
        J = abs((x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0))
        s = np.sin(np.radians(latc))
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        N = a / np.sqrt(1 - e2 * s * s)
        dA = M * N * np.cos(np.radians(latc)) * np.radians(d) ** 2
        assert J / dA == pytest.approx(1.0, abs=1e-6)
    for sp in (29.5, 45.5):                   # unit parallel scale at SPs
        x1, y1 = crs.lonlat_to_albers(-96.0, sp, 5070)
        x2, y2 = crs.lonlat_to_albers(-96.0 + d, sp, 5070)
        s = np.sin(np.radians(sp))
        geod = (a * np.cos(np.radians(sp)) / np.sqrt(1 - e2 * s * s)
                * np.radians(d))
        assert np.hypot(x2 - x1, y2 - y1) / geod == pytest.approx(
            1.0, abs=1e-7)


def test_albers_dispatch():
    x, y = crs.transform_points("EPSG:4326", "EPSG:5070", -104.99, 39.74)
    x2, y2 = crs.lonlat_to_albers(-104.99, 39.74, 5070)
    assert np.allclose([x, y], [x2, y2])
    lo, la = crs.transform_points("EPSG:5070", "EPSG:4326", x, y)
    assert np.allclose([lo, la], [-104.99, 39.74])
