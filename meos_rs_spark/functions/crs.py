"""General CRS transforms (SURVEY.md §2.8 L2 spatial family).

The reference links PROJ for SRID transforms (``meos-sys/build.rs:6-14``;
L2 ``tpoint_transform``). This container has no pyproj, so the transform
kernel is a self-contained WGS84 → UTM transverse-mercator implementation
(the standard Snyder/Krüger series, public formulas — USGS PP 1395 §8), as a
numpy-vectorized function wrapped in a pandas_udf. A deployment with pyproj
swaps ``_utm_numpy`` for ``pyproj.Transformer`` without touching the Spark
plumbing; results here are series-accurate to ~1 mm inside the zone, which
tests pin via exactness invariants (central meridian → easting exactly
500 000, equator → northing exactly 0) and round-trip monotonicity.

Web-mercator (EPSG:3857) stays a pure-Column closed form in
queries/trajectory.py (``traj_project_mercator``) — it needs no series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

# WGS84 ellipsoid + UTM constants
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_FALSE_E = 500000.0


def normalize_lon(lon: np.ndarray) -> np.ndarray:
    """Wrap arbitrary 'longitude-like' doubles into [-180, 180).

    The plain modulo can round to exactly 360.0 for inputs one ulp below a
    wrap boundary (e.g. -180.0000000000000028), yielding 180.0 — outside
    the contract, and utm_zone would derive the nonexistent zone 61 with a
    central meridian 3° away (review find, r7). 180.0 is folded to its
    equivalent -180.0."""
    r = (lon + 180.0) % 360.0 - 180.0
    return np.where(r >= 180.0, -180.0, r)


def utm_zone(lon: np.ndarray) -> np.ndarray:
    """UTM zone number for a normalized longitude."""
    return (np.floor((normalize_lon(lon) + 180.0) / 6.0) + 1.0).astype(np.int32)


def tm_series(
    a: float,
    f: float,
    phi: np.ndarray,
    lam: np.ndarray,
    lam0: np.ndarray | float,
    phi0_deg: float = 0.0,
    k0: float = _K0,
    false_e: float = _FALSE_E,
    false_n: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """The ONE transverse-mercator series (Snyder PP 1395 eqs 8-9..8-13,
    public formulas), parameterized over ellipsoid + natural origin so any
    EPSG TM zone (UTM, British National Grid, State Plane TM zones) is a
    constant tuple away — the same generalization step ``lcc_2sp`` makes
    for conics. ``phi``/``lam``/``lam0`` are radians (``lam0`` may vary per
    point: UTM derives it from the zone); a non-equatorial natural origin
    subtracts the meridian arc M(phi0) per Snyder 8-13.

    Reference slot: the PROJ link at ``meos-sys/build.rs:6-14``.
    """
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    m0c = 1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0
    m2c = 3.0 * e2 / 8.0 + 3.0 * e2**2 / 32.0 + 45.0 * e2**3 / 1024.0
    m4c = 15.0 * e2**2 / 256.0 + 45.0 * e2**3 / 1024.0
    m6c = 35.0 * e2**3 / 3072.0

    def arc(p: np.ndarray | float) -> np.ndarray | float:
        # meridian arc M(phi), Snyder eq. 3-21
        return a * (
            m0c * p
            - m2c * np.sin(2.0 * p)
            + m4c * np.sin(4.0 * p)
            - m6c * np.sin(6.0 * p)
        )

    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    n = a / np.sqrt(1.0 - e2 * sin_p**2)
    t = tan_p**2
    c = ep2 * cos_p**2
    a_ = (lam - lam0) * cos_p
    m = arc(phi)
    m_origin = arc(np.deg2rad(phi0_deg)) if phi0_deg else 0.0
    easting = false_e + k0 * n * (
        a_
        + (1.0 - t + c) * a_**3 / 6.0
        + (5.0 - 18.0 * t + t**2 + 72.0 * c - 58.0 * ep2) * a_**5 / 120.0
    )
    northing = false_n + k0 * (
        m
        - m_origin
        + n
        * tan_p
        * (
            a_**2 / 2.0
            + (5.0 - t + 9.0 * c + 4.0 * c**2) * a_**4 / 24.0
            + (61.0 - 58.0 * t + t**2 + 600.0 * c - 330.0 * ep2) * a_**6 / 720.0
        )
    )
    return easting, northing


def tm_series_inverse(
    a: float,
    f: float,
    x: np.ndarray,
    y: np.ndarray,
    lam0: np.ndarray | float,
    phi0_deg: float = 0.0,
    k0: float = _K0,
    false_e: float = _FALSE_E,
    false_n: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`tm_series` (Snyder PP 1395 eqs 8-16..8-25, the
    footpoint-latitude route): grid (x, y) → (lon, lat) in degrees. The
    reference's PROJ slot transforms both directions
    (``meos-sys/build.rs:6-14``); this completes the self-contained
    kernel's parity. Accuracy is the series' own (~1 mm equivalent inside
    a zone) — the roundtrip property test pins forward∘inverse ≈ id to
    1e-9 degrees."""
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    m0c = 1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0
    m2c = 3.0 * e2 / 8.0 + 3.0 * e2**2 / 32.0 + 45.0 * e2**3 / 1024.0
    m4c = 15.0 * e2**2 / 256.0 + 45.0 * e2**3 / 1024.0
    m6c = 35.0 * e2**3 / 3072.0

    def arc(p: float) -> float:
        return a * (
            m0c * p - m2c * np.sin(2.0 * p) + m4c * np.sin(4.0 * p) - m6c * np.sin(6.0 * p)
        )

    xp = np.asarray(x, dtype=np.float64) - false_e
    m = (arc(np.deg2rad(phi0_deg)) if phi0_deg else 0.0) + (
        np.asarray(y, dtype=np.float64) - false_n
    ) / k0
    mu = m / (a * m0c)
    sq = np.sqrt(1.0 - e2)
    e1 = (1.0 - sq) / (1.0 + sq)
    # footpoint latitude, Snyder eq. 3-26
    phi1 = (
        mu
        + (3.0 * e1 / 2.0 - 27.0 * e1**3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * e1**2 / 16.0 - 55.0 * e1**4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * e1**3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * e1**4 / 512.0) * np.sin(8.0 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    c1 = ep2 * cos1**2
    t1 = tan1**2
    w = 1.0 - e2 * sin1**2
    n1 = a / np.sqrt(w)
    r1 = a * (1.0 - e2) / w**1.5
    d = xp / (n1 * k0)
    phi = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1**2 - 9.0 * ep2) * d**4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1**2 - 252.0 * ep2 - 3.0 * c1**2)
        * d**6
        / 720.0
    )
    lam = lam0 + (
        d
        - (1.0 + 2.0 * t1 + c1) * d**3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1**2 + 8.0 * ep2 + 24.0 * t1**2)
        * d**5
        / 120.0
    ) / cos1
    return np.rad2deg(lam), np.rad2deg(phi)


def utm_inverse(
    zone: np.ndarray, easting: np.ndarray, northing: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) from WGS84 UTM (zone, easting, northing) — the inverse
    of :func:`_utm_numpy`, same northern-hemisphere convention."""
    lam0 = np.deg2rad(np.asarray(zone, dtype=np.float64) * 6.0 - 183.0)
    return tm_series_inverse(_A, _F, easting, northing, lam0)


def _utm_numpy(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(zone, easting, northing) — WGS84 UTM via :func:`tm_series`,
    northern-hemisphere convention (no 10 000 km false northing; the
    fixture 'lat' is >= 0)."""
    lon_n = normalize_lon(np.asarray(lon, dtype=np.float64))
    lat_c = np.clip(np.asarray(lat, dtype=np.float64), -84.0, 84.0)
    zone = utm_zone(lon_n)
    lam0 = np.deg2rad(zone * 6.0 - 183.0)
    easting, northing = tm_series(
        _A, _F, np.deg2rad(lat_c), np.deg2rad(lon_n), lam0
    )
    return zone, easting, northing


# --- Lambert conformal conic, 2 standard parallels (Snyder §15) -------------
#
# Unlike transverse mercator, LCC 2SP is an exact closed form — no series
# truncation. ``lcc_2sp`` builds a projection function from the five zone
# parameters + ellipsoid, which is how the kernel generalizes past UTM: any
# conic EPSG zone (Lambert-93, US State Plane Lambert zones, Europe LCC) is
# one constant-tuple away. The registered query instance is Lambert-93
# (EPSG:2154, RGF93 / GRS80) — the conic national grid PROJ ships for France.


def lcc_2sp(
    a: float,
    f: float,
    phi1_deg: float,
    phi2_deg: float,
    phi0_deg: float,
    lon0_deg: float,
    false_e: float,
    false_n: float,
):
    """Build a closed-form LCC-2SP forward transform (Snyder eqs 15-1..15-10,
    14-15). Returns ``fn(lon, lat) -> (easting, northing)`` over numpy
    arrays. Latitudes are clipped away from the far pole (|phi| <= 84°),
    where ``t`` diverges."""
    e2 = f * (2.0 - f)
    ecc = float(np.sqrt(e2))

    def _m(phi: float | np.ndarray) -> float | np.ndarray:
        return np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)

    def _t(phi: float | np.ndarray) -> float | np.ndarray:
        sin_p = np.sin(phi)
        return np.tan(np.pi / 4.0 - phi / 2.0) / (
            (1.0 - ecc * sin_p) / (1.0 + ecc * sin_p)
        ) ** (ecc / 2.0)

    phi1, phi2 = np.deg2rad(phi1_deg), np.deg2rad(phi2_deg)
    phi0, lam0 = np.deg2rad(phi0_deg), np.deg2rad(lon0_deg)
    n = (np.log(_m(phi1)) - np.log(_m(phi2))) / (np.log(_t(phi1)) - np.log(_t(phi2)))
    big_f = _m(phi1) / (n * _t(phi1) ** n)
    rho0 = a * big_f * _t(phi0) ** n

    def forward(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lon_n = normalize_lon(np.asarray(lon, dtype=np.float64))
        lat_c = np.clip(np.asarray(lat, dtype=np.float64), -84.0, 84.0)
        phi = np.deg2rad(lat_c)
        theta = n * (np.deg2rad(lon_n) - lam0)
        rho = a * big_f * _t(phi) ** n
        return false_e + rho * np.sin(theta), false_n + rho0 - rho * np.cos(theta)

    def inverse(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Snyder eqs 15-11..14 + the 7-9/3-5 fixed-point iteration for phi
        (converges quadratically; 8 rounds reach double precision)."""
        dx = np.asarray(x, dtype=np.float64) - false_e
        dy = rho0 - (np.asarray(y, dtype=np.float64) - false_n)
        rho = np.sign(n) * np.hypot(dx, dy)
        theta = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
        t = (rho / (a * big_f)) ** (1.0 / n)
        lam = theta / n + lam0
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            sin_p = np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - ecc * sin_p) / (1.0 + ecc * sin_p)) ** (ecc / 2.0)
            )
        return np.rad2deg(lam), np.rad2deg(phi)

    forward.inverse = inverse
    return forward


# GRS80 ellipsoid (RGF93 datum; identical axis to WGS84, flattening differs
# in the 10th significant digit)
_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101

#: Lambert-93 / EPSG:2154 forward transform
_lcc93_numpy = lcc_2sp(
    _GRS80_A, _GRS80_F, 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0
)


# Struct-returning wrappers: one Arrow crossing per batch and ONE kernel
# evaluation per point. The per-component wrappers they replace each ran
# the full transcendental kernel and discarded the other outputs, so a
# query selecting every component paid the projection 2-3x (review find,
# r7). Same pattern serde.py uses for TRAJ_WKB_PARSED.


# explicit StructType (not a DDL string): a DDL returnType parses lazily
# against the ACTIVE session, which does not exist when this module is
# imported at test-collection time
_UTM_TYPE = StructType([
    StructField("zone", IntegerType()),
    StructField("easting", DoubleType()),
    StructField("northing", DoubleType()),
])
_LCC_TYPE = StructType([
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
])


@pandas_udf(_UTM_TYPE)
def utm_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    z, e, n = _utm_numpy(lon.to_numpy(np.float64), lat.to_numpy(np.float64))
    return pd.DataFrame({"zone": z, "easting": e, "northing": n})


@pandas_udf(_LCC_TYPE)
def lcc93_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    x, y = _lcc93_numpy(lon.to_numpy(np.float64), lat.to_numpy(np.float64))
    return pd.DataFrame({"x": x, "y": y})


@pandas_udf(DoubleType())
def utm_roundtrip_err_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """Degrees of error after lon/lat → UTM → lon/lat (max of the two
    components). The forward leg normalizes longitude, so the reference
    is the normalized input; callers must pre-filter |lat| <= 84 (the
    forward clamp is lossy beyond it). One kernel pair per Arrow batch."""
    ln = lon.to_numpy(np.float64)
    lt = lat.to_numpy(np.float64)
    zone, e, n = _utm_numpy(ln, lt)
    lon2, lat2 = utm_inverse(zone, e, n)
    return pd.Series(
        np.maximum(np.abs(lon2 - normalize_lon(ln)), np.abs(lat2 - lt))
    )
