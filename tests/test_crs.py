"""Kernel tests for the UTM transverse-mercator series (functions/crs.py) —
exactness invariants the formulas guarantee by construction, plus a published
sample point. These pin the kernel the traj_transform_utm golden oracle is
generated from."""

from __future__ import annotations

import numpy as np

from meos_rs_spark.functions.crs import (
    _lcc93_numpy,
    _utm_numpy,
    lcc_2sp,
    normalize_lon,
    utm_zone,
)


def test_central_meridian_is_false_easting():
    # on the central meridian A == 0, so easting must be exactly 500000
    for lon, lat in [(3.0, 10.0), (9.0, 45.0), (-87.0, 30.0), (147.0, -20.0)]:
        _, e, _ = _utm_numpy(np.array([lon]), np.array([lat]))
        assert e[0] == 500000.0


def test_equator_is_zero_northing():
    # at phi == 0 the meridian arc and tan(phi) vanish identically
    for lon in (-100.0, 0.5, 44.0, 170.0):
        _, _, n = _utm_numpy(np.array([lon]), np.array([0.0]))
        assert n[0] == 0.0


def test_known_point_zone31():
    # 1° east of the zone-31 central meridian at 52°N. Expected values
    # verified against an INDEPENDENT transverse-mercator formulation
    # (Karney/Krüger n-series to n^4, conformal-latitude route) — the two
    # implementations agree to ~1 mm; 10 cm tolerance catches any
    # coefficient or sign regression without depending on pyproj
    z, e, n = _utm_numpy(np.array([4.0]), np.array([52.0]))
    assert z[0] == 31
    assert abs(e[0] - 568649.705) < 0.1
    assert abs(n[0] - 5761510.317) < 0.1


def test_zone_boundaries():
    assert utm_zone(np.array([-180.0]))[0] == 1
    assert utm_zone(np.array([-174.001]))[0] == 1
    assert utm_zone(np.array([-174.0]))[0] == 2
    assert utm_zone(np.array([0.0]))[0] == 31
    assert utm_zone(np.array([179.9]))[0] == 60
    # the fixture's 'longitude' column spans ~0..330 — wraps into [-180, 180)
    assert normalize_lon(np.array([330.0]))[0] == -30.0
    assert utm_zone(np.array([330.0]))[0] == 26


def test_easting_monotonic_in_lon_within_zone():
    lons = np.linspace(6.5, 11.5, 21)  # inside zone 32
    lats = np.full_like(lons, 37.0)
    _, e, _ = _utm_numpy(lons, lats)
    assert (np.diff(e) > 0).all()


def test_northing_monotonic_in_lat():
    lats = np.linspace(1.0, 80.0, 40)
    lons = np.full_like(lats, 9.0)
    _, _, n = _utm_numpy(lons, lats)
    assert (np.diff(n) > 0).all()


def test_matches_independent_karney_series():
    """Cross-check the Snyder kernel against a structurally different
    transverse-mercator formulation (Karney/Krüger n-series to n^4 via the
    conformal latitude) — agreement to 2 mm over the whole usable domain
    means a shared-constant or series-coefficient bug in either would show."""
    a_ = 6378137.0
    f = 1 / 298.257223563
    n = f / (2 - f)
    k0, e0 = 0.9996, 500000.0
    big_a = a_ / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = [
        0.0,
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
        61 * n**3 / 240 - 103 * n**4 / 140,
        49561 * n**4 / 161280,
    ]
    ecc = np.sqrt(f * (2 - f))

    def karney(lon, lat, lon0):
        phi = np.deg2rad(lat)
        lam = np.deg2rad(lon - lon0)
        t = np.sinh(np.arctanh(np.sin(phi)) - ecc * np.arctanh(ecc * np.sin(phi)))
        xi_ = np.arctan2(t, np.cos(lam))
        eta_ = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
        xi = xi_ + sum(alpha[j] * np.sin(2 * j * xi_) * np.cosh(2 * j * eta_) for j in range(1, 5))
        eta = eta_ + sum(alpha[j] * np.cos(2 * j * xi_) * np.sinh(2 * j * eta_) for j in range(1, 5))
        return e0 + k0 * big_a * eta, k0 * big_a * xi

    rng = np.random.default_rng(11)
    lons = rng.uniform(-179.0, 179.0, 60)
    lats = rng.uniform(0.5, 82.0, 60)
    zone = utm_zone(lons)
    lon0 = zone * 6.0 - 183.0
    _, e_s, n_s = _utm_numpy(lons, lats)
    for lo, la, l0, ee, nn in zip(lons, lats, lon0, e_s, n_s):
        ke, kn = karney(lo, la, l0)
        assert abs(ke - ee) < 0.002 and abs(kn - nn) < 0.002, (lo, la)


# --- published known-answer vectors (r9 VERDICT item 6) ---------------------
#
# External ground truth that does NOT depend on pyproj being installed: the
# worked examples published in EPSG Guidance Note 7-2 (IOGP publication
# 373-7-2, "Coordinate Conversions and Transformations including Formulas")
# and Snyder PP 1395. Each pins the full parameterized kernel — ellipsoid,
# natural origin, scale factor, false origin — against independently
# published numbers, to the precision those sources print. Together with
# the in-file Snyder §15 LCC example, the Lambert-93 landmark and the
# Karney-verified zone-31 point, the CRS kernels carry six external
# ground-truth points; the pyproj tests below become redundant
# confirmation where the library exists.


def test_epsg_gn7_2_transverse_mercator_osgb():
    """EPSG GN7-2 §3.5.3.1 TM worked example (OSGB36 / British National
    Grid, EPSG:27700): Airy 1830 (a=6377563.396, 1/f=299.3249646), natural
    origin 49°N 2°W, k0=0.9996012717, FE=400000, FN=-100000. The point
    50°30'00"N 00°30'00"E projects to E=577274.99, N=69740.50 — published
    to the cm, asserted to the cm. Exercises the non-equatorial-origin
    M(phi0) term no UTM zone uses."""
    from meos_rs_spark.functions.crs import tm_series

    e, n = tm_series(
        6377563.396,
        1.0 / 299.3249646,
        np.deg2rad(np.array([50.5])),
        np.deg2rad(np.array([0.5])),
        np.deg2rad(-2.0),
        phi0_deg=49.0,
        k0=0.9996012717,
        false_e=400000.0,
        false_n=-100000.0,
    )
    assert abs(e[0] - 577274.99) < 0.01
    assert abs(n[0] - 69740.50) < 0.01


def test_snyder_tm_ellipsoid_example():
    """Snyder PP 1395 §8 ellipsoidal TM numerical example (p. 269-270):
    Clarke 1866 (a=6378206.4, e²=0.00676866), central meridian 75°W,
    k0=0.9996, equatorial origin, no false origin. The point 40°30'N
    73°30'W projects to x=127106.5, y=4484124.4 (published to 0.1 m)."""
    from meos_rs_spark.functions.crs import tm_series

    f = 1.0 - np.sqrt(1.0 - 0.00676866)
    x, y = tm_series(
        6378206.4,
        f,
        np.deg2rad(np.array([40.5])),
        np.deg2rad(np.array([-73.5])),
        np.deg2rad(-75.0),
        k0=0.9996,
        false_e=0.0,
        false_n=0.0,
    )
    assert abs(x[0] - 127106.5) < 0.1
    assert abs(y[0] - 4484124.4) < 0.1


def test_epsg_gn7_2_lcc_2sp_texas_south_central():
    """EPSG GN7-2 §3.1.1.1 LCC-2SP worked example (NAD27 / Texas South
    Central): Clarke 1866 in US survey feet (a=20925832.16 ftUS), false
    origin 27°50'N 99°00'W, standard parallels 28°23'N / 30°17'N,
    FE=2000000 ftUS. The point 28°30'N 96°00'W projects to
    E=2963503.91, N=254759.80 ftUS — published AND asserted to 0.01 ft.
    Second external pin on lcc_2sp with a completely different ellipsoid,
    unit, and parallel pair than the Lambert-93 instance."""
    tx = lcc_2sp(
        20925832.16,
        1.0 - 6356583.8 / 6378206.4,
        28.0 + 23.0 / 60.0,
        30.0 + 17.0 / 60.0,
        27.0 + 50.0 / 60.0,
        -99.0,
        2000000.0,
        0.0,
    )
    x, y = tx(np.array([-96.0]), np.array([28.5]))
    assert abs(x[0] - 2963503.91) < 0.01
    assert abs(y[0] - 254759.80) < 0.01


def test_epsg_gn7_2_tm_reverse_osgb():
    """The GN7-2 OSGB worked example run in REVERSE: the published grid
    coords (577274.99, 69740.50) must invert to 50°30'N 00°30'E. The
    residual is exactly the cm-rounding of the published grid point
    (~1e-7°), so 5e-7° pins it."""
    from meos_rs_spark.functions.crs import tm_series_inverse

    lon, lat = tm_series_inverse(
        6377563.396,
        1.0 / 299.3249646,
        np.array([577274.99]),
        np.array([69740.50]),
        np.deg2rad(-2.0),
        phi0_deg=49.0,
        k0=0.9996012717,
        false_e=400000.0,
        false_n=-100000.0,
    )
    assert abs(lon[0] - 0.5) < 5e-7
    assert abs(lat[0] - 50.5) < 5e-7


def test_tm_roundtrip_property():
    """hypothesis: forward∘inverse == identity for the TM series over the
    usable UTM domain — same self-consistency bar the LCC kernel meets
    (a wrong series coefficient cannot cancel through both directions).
    2e-8° ≈ 2 mm: the truncation error of the inverse series itself."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from meos_rs_spark.functions.crs import utm_inverse

    # BOTH hemispheres (r11: the registered roundtrip query now admits
    # lat down to -84 via its abs() domain filter, so the southern branch
    # is live — the kernel's SIGNED northing must roundtrip it; the old
    # [0.01, 83.9] range left that unpinned). Equator excluded by a tiny
    # margin only to dodge the lat=±0.0 sign ambiguity in the assert.
    @settings(max_examples=200, deadline=None)
    @given(
        lon=st.floats(min_value=-179.99, max_value=179.99),
        lat=st.floats(min_value=-83.9, max_value=83.9),
    )
    def check(lon: float, lat: float) -> None:
        z, e, n = _utm_numpy(np.array([lon]), np.array([lat]))
        lon2, lat2 = utm_inverse(z, e, n)
        assert abs(lon2[0] - lon) < 2e-8
        assert abs(lat2[0] - lat) < 2e-8

    check()


def test_utm_is_the_parameterized_tm_series():
    """_utm_numpy must be exactly tm_series at the WGS84/UTM constants —
    the refactor that generalized the kernel cannot have forked it."""
    from meos_rs_spark.functions.crs import tm_series, utm_zone

    rng = np.random.default_rng(3)
    lons = rng.uniform(-179.0, 179.0, 40)
    lats = rng.uniform(0.5, 83.0, 40)
    z, e, n = _utm_numpy(lons, lats)
    lam0 = np.deg2rad(utm_zone(lons) * 6.0 - 183.0)
    e2, n2 = tm_series(
        6378137.0, 1.0 / 298.257223563, np.deg2rad(lats), np.deg2rad(lons), lam0
    )
    np.testing.assert_array_equal(e, e2)
    np.testing.assert_array_equal(n, n2)


def test_matches_pyproj_if_available():
    try:
        from pyproj import Transformer
    except ImportError:
        import pytest

        pytest.skip(
            "pyproj not in container — external ground truth covered by the "
            "EPSG GN7-2 / Snyder known-answer vectors above"
        )
    tr = Transformer.from_crs("EPSG:4326", "EPSG:32632", always_xy=True)
    lons = np.array([7.0, 9.0, 11.0])
    lats = np.array([10.0, 45.0, 70.0])
    _, e, n = _utm_numpy(lons, lats)
    for lo, la, ee, nn in zip(lons, lats, e, n):
        px, py = tr.transform(lo, la)
        assert abs(px - ee) < 0.01 and abs(py - nn) < 0.01


# --- Lambert conformal conic (2SP) kernel -----------------------------------


def test_lcc_grid_origin_is_false_origin():
    # at (lon0, phi0): theta == 0 and rho == rho0, so (E0, N0) exactly
    # (up to one ulp of the rho0 - rho cancellation)
    x, y = _lcc93_numpy(np.array([3.0]), np.array([46.5]))
    assert abs(x[0] - 700000.0) < 1e-6
    assert abs(y[0] - 6600000.0) < 1e-6


def test_lcc_snyder_book_example():
    """Snyder PP 1395 §15 numerical example (p. 296): Clarke 1866,
    standard parallels 33°/45°N, origin 23°N 96°W; the point 35°N 75°W
    projects to x = 1 894 410.9, y = 1 564 649.5 — pins every constant in
    the closed form against published values."""
    a, b = 6378206.4, 6356583.8
    tx = lcc_2sp(a, 1.0 - b / a, 33.0, 45.0, 23.0, -96.0, 0.0, 0.0)
    x, y = tx(np.array([-75.0]), np.array([35.0]))
    assert abs(x[0] - 1894410.9) < 0.1
    assert abs(y[0] - 1564649.5) < 0.1


def test_lcc_paris_landmark():
    # Notre-Dame de Paris in Lambert-93 — the conventional EPSG:2154 sanity
    # point (known grid coords ~(652.5 km, 6862.0 km))
    x, y = _lcc93_numpy(np.array([2.3522]), np.array([48.8566]))
    assert abs(x[0] - 652469.0) < 5.0
    assert abs(y[0] - 6862035.0) < 5.0


def test_lcc_matches_independent_isometric_formulation():
    """Cross-check against a structurally different route: t(phi) via the
    isometric latitude (t = exp(-psi), psi = arctanh(sin) - e*arctanh(e sin))
    instead of Snyder's tan/power-quotient form, with its own n/F/rho
    recomputation — a transcription error in either formulation would show."""
    a_, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2 - f)
    ecc = np.sqrt(e2)

    def t_iso(phi):
        s = np.sin(phi)
        return np.exp(-(np.arctanh(s) - ecc * np.arctanh(ecc * s)))

    def m(phi):
        return np.cos(phi) / np.sqrt(1 - e2 * np.sin(phi) ** 2)

    p1, p2, p0, l0 = map(np.deg2rad, (44.0, 49.0, 46.5, 3.0))
    n = np.log(m(p1) / m(p2)) / np.log(t_iso(p1) / t_iso(p2))
    big_f = m(p1) / (n * t_iso(p1) ** n)
    rho0 = a_ * big_f * t_iso(p0) ** n

    rng = np.random.default_rng(7)
    lons = rng.uniform(-179.0, 179.0, 60)
    lats = rng.uniform(-60.0, 83.0, 60)
    x_s, y_s = _lcc93_numpy(lons, lats)
    phi = np.deg2rad(lats)
    theta = n * (np.deg2rad(lons) - l0)
    rho = a_ * big_f * t_iso(phi) ** n
    x_i = 700000.0 + rho * np.sin(theta)
    y_i = 6600000.0 + rho0 - rho * np.cos(theta)
    np.testing.assert_allclose(x_s, x_i, rtol=0, atol=1e-5)
    np.testing.assert_allclose(y_s, y_i, rtol=0, atol=1e-5)


def test_lcc_monotonicity_in_zone():
    # within the zone (theta small, n > 0): easting increases with lon,
    # northing increases with lat
    lons = np.linspace(-4.0, 9.0, 27)
    x, _ = _lcc93_numpy(lons, np.full_like(lons, 46.5))
    assert (np.diff(x) > 0).all()
    lats = np.linspace(41.0, 51.0, 21)
    _, y = _lcc93_numpy(np.full_like(lats, 3.0), lats)
    assert (np.diff(y) > 0).all()


def test_lcc_roundtrip_property():
    """hypothesis: forward∘inverse == identity over the usable domain —
    the sharpest self-consistency check a projection closed form admits
    (a wrong constant cannot cancel through both directions)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        lon=st.floats(min_value=-179.99, max_value=179.99),
        lat=st.floats(min_value=-83.9, max_value=83.9),
    )
    def check(lon: float, lat: float) -> None:
        x, y = _lcc93_numpy(np.array([lon]), np.array([lat]))
        lon2, lat2 = _lcc93_numpy.inverse(x, y)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    check()


def test_lcc_matches_pyproj_if_available():
    try:
        from pyproj import Transformer
    except ImportError:
        import pytest

        pytest.skip(
            "pyproj not in container — external ground truth covered by the "
            "EPSG GN7-2 Texas LCC-2SP vector and the Snyder/Paris pins"
        )
    tr = Transformer.from_crs("EPSG:4326", "EPSG:2154", always_xy=True)
    lons = np.array([-1.5, 2.35, 5.0, 7.7])
    lats = np.array([43.5, 48.86, 44.0, 49.5])
    x, y = _lcc93_numpy(lons, lats)
    for lo, la, xx, yy in zip(lons, lats, x, y):
        px, py = tr.transform(lo, la)
        assert abs(px - xx) < 0.01 and abs(py - yy) < 0.01


def test_roundtrip_err_udf_southern_hemisphere(spark):
    """e2e pin for the r10-ADVICE domain fix: a southern-hemisphere posit
    inside |lat| <= 84 must roundtrip under the registered query's error
    UDF (signed northing, no hemisphere split), while a posit BEYOND the
    domain (lat < -84) shows the lossy forward clamp the abs() filter
    exists to exclude — the exact false-red the one-sided filter would
    have produced on a southern fixture."""
    import pyspark.sql.functions as F

    from meos_rs_spark.functions.crs import utm_roundtrip_err_udf

    df = spark.createDataFrame(
        [(1, 23.4, -45.0), (2, 23.4, -83.9), (3, 23.4, 45.0), (4, 23.4, -87.0)],
        "id long, lon double, lat double",
    )
    errs = {
        r.id: r.e
        for r in df.select(
            "id", utm_roundtrip_err_udf(F.col("lon"), F.col("lat")).alias("e")
        ).collect()
    }
    assert errs[1] < 1e-6 and errs[2] < 1e-6 and errs[3] < 1e-6
    assert errs[4] > 1e-6  # beyond the clamp: roundtrip error explodes
