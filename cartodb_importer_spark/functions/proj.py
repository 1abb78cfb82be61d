"""Dependency-free coordinate reprojection to WGS84 (EPSG:4326).

The reference reprojects in-database with PostGIS ``ST_Transform``
(importer.rb:375-386, O16). Here the common projected CRSs are implemented
directly so the SHP path reprojects even without pyproj installed:

* EPSG:3857 (spherical Web Mercator) — closed form;
* EPSG:326xx / 327xx (WGS84 UTM north/south) — transverse Mercator via the
  6th-order Krüger series (Karney 2011, "Transverse Mercator with an
  accuracy of a few nanometers" — public formulas), accurate to well under
  1 mm within a UTM zone's extent.

All kernels are numpy-vectorized: inside a Pandas UDF they transform whole
Arrow batches of coordinates at once — the 100 TB path is
``mapInPandas``/``pandas_udf`` over coordinate arrays, never a per-row
Python loop (and never a per-row UPDATE like the reference's O11 loop).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E = float(np.sqrt(_F * (2.0 - _F)))  # first eccentricity
_E2 = _F * (2.0 - _F)

# Krüger series in n = f / (2 - f)
_N = _F / (2.0 - _F)
# rectifying radius
_A1 = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440 + 281 * _N**5 / 630
    - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168 + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504 - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
)

_K0 = 0.9996  # UTM scale at central meridian
_UTM_E0 = 500000.0
_UTM_N0_SOUTH = 10000000.0

_R_MERC = 6378137.0  # Web Mercator sphere radius


# ---------------------------------------------------------------- EPSG:3857


def webmercator_inverse(x, y):
    """EPSG:3857 (x, y) metres -> (lon, lat) degrees. Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _R_MERC)
    lat = np.degrees(np.arctan(np.sinh(y / _R_MERC)))
    return lon, lat


def webmercator_forward(lon, lat):
    """(lon, lat) degrees -> EPSG:3857 metres. Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = _R_MERC * np.radians(lon)
    y = _R_MERC * np.arcsinh(np.tan(np.radians(lat)))
    return x, y


# ------------------------------------------------------- transverse Mercator


def _tm_forward(lon, lat, lon0: float):
    """Krüger-series transverse Mercator forward: degrees -> (ξ, η) before
    scaling (multiply by k0·A1 and add false offsets for a full grid)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sphi = np.sin(phi)
    # conformal latitude tangent
    t = np.sinh(np.arctanh(sphi) - _E * np.arctanh(_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return xi, eta


def _tm_inverse(xi, eta, lon0: float):
    """Krüger-series inverse: normalized (ξ, η) -> (lon, lat) degrees."""
    xi = np.asarray(xi, dtype=np.float64)
    eta = np.asarray(eta, dtype=np.float64)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    tau_p = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton-solve tau (tan of geographic latitude) from tau' (tan of
    # conformal latitude): tau' = tau*sqrt(1+sigma^2) - sigma*sqrt(1+tau^2)
    tau = tau_p / (1.0 - _E2)  # good starting guess
    for _ in range(6):
        sigma = np.sinh(_E * np.arctanh(_E * tau / np.hypot(1.0, tau)))
        f = tau * np.hypot(1.0, sigma) - sigma * np.hypot(1.0, tau) - tau_p
        df = (
            (np.hypot(1.0, sigma) * np.hypot(1.0, tau) - sigma * tau)
            * (1.0 - _E2)
            * np.hypot(1.0, tau)
            / (1.0 + (1.0 - _E2) * tau * tau)
        )
        tau = tau - f / df
    lat = np.degrees(np.arctan(tau))
    lon = np.degrees(lam) + lon0
    return lon, lat


def utm_forward(lon, lat, zone: int, south: bool = False):
    """(lon, lat) degrees -> UTM (easting, northing) for the given zone."""
    lon0 = zone * 6.0 - 183.0
    xi, eta = _tm_forward(lon, lat, lon0)
    e = _UTM_E0 + _K0 * _A1 * eta
    n = (_UTM_N0_SOUTH if south else 0.0) + _K0 * _A1 * xi
    return e, n


def utm_inverse(easting, northing, zone: int, south: bool = False):
    """UTM (easting, northing) -> (lon, lat) degrees for the given zone."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    xi = (northing - (_UTM_N0_SOUTH if south else 0.0)) / (_K0 * _A1)
    eta = (easting - _UTM_E0) / (_K0 * _A1)
    return _tm_inverse(xi, eta, zone * 6.0 - 183.0)


# ----------------------------------------- Lambert Conformal Conic (2SP)
# Snyder, "Map Projections — A Working Manual" (USGS PP 1395, 1987),
# pp. 104-110 — public formulas. GRS80 and WGS84 differ by < 0.1 mm in
# flattening; the datum shift between WGS84 and the ETRS89/RGF93/NAD83
# realizations below is < ~2 m and is treated as identity (the same
# approximation pyproj applies without a datum grid).


class LCCParams:
    """2SP Lambert Conformal Conic parameter set (angles in degrees)."""

    def __init__(self, lat0, lon0, lat1, lat2, fe, fn, a=_A, f=_F):
        self.lat0, self.lon0 = lat0, lon0
        self.lat1, self.lat2 = lat1, lat2
        self.fe, self.fn = fe, fn
        self.a = a
        e2 = f * (2.0 - f)
        self.e = float(np.sqrt(e2))

        def m(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)

        def t(phi):
            s = np.sin(phi)
            return np.tan(np.pi / 4.0 - phi / 2.0) / (
                (1.0 - self.e * s) / (1.0 + self.e * s)
            ) ** (self.e / 2.0)

        p0, p1, p2 = map(np.radians, (lat0, lat1, lat2))
        m1, m2 = m(p1), m(p2)
        t0, t1, t2 = t(p0), t(p1), t(p2)
        self.n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
        self.F = float(m1 / (self.n * t1**self.n))
        self.rho0 = float(self.a * self.F * t0**self.n)


#: Common LCC CRSs (parameters from the public EPSG registry).
LCC_EPSG: dict[int, LCCParams] = {
    # RGF93 / Lambert-93 (France)
    2154: LCCParams(46.5, 3.0, 49.0, 44.0, 700000.0, 6600000.0),
    # NAD83 / Statistics Canada Lambert
    3347: LCCParams(63.390675, -91.866667, 49.0, 77.0, 6200000.0, 3000000.0),
    # ETRS89-extended / LCC Europe
    3034: LCCParams(52.0, 10.0, 35.0, 65.0, 4000000.0, 2800000.0),
}


def lcc_forward(lon, lat, p: LCCParams):
    """(lon, lat) degrees -> LCC (easting, northing). Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    s = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - p.e * s) / (1.0 + p.e * s)
    ) ** (p.e / 2.0)
    rho = p.a * p.F * t**p.n
    theta = p.n * np.radians(lon - p.lon0)
    return p.fe + rho * np.sin(theta), p.fn + p.rho0 - rho * np.cos(theta)


def lcc_inverse(x, y, p: LCCParams):
    """LCC (easting, northing) -> (lon, lat) degrees. Vectorized; the
    latitude series inverts t(phi) by fixed-point iteration (converges
    quadratically; 8 rounds reach double precision everywhere LCC is
    defined)."""
    x = np.asarray(x, dtype=np.float64) - p.fe
    y = p.rho0 - (np.asarray(y, dtype=np.float64) - p.fn)
    rho = np.sign(p.n) * np.hypot(x, y)
    theta = np.arctan2(np.sign(p.n) * x, np.sign(p.n) * y)
    t = (rho / (p.a * p.F)) ** (1.0 / p.n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = p.e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (p.e / 2.0)
        )
    lon = np.degrees(theta / p.n) + p.lon0
    return lon, np.degrees(phi)


# ------------------------------------------------ Albers Equal Area (2SP)


class AlbersParams:
    """Albers Equal-Area Conic parameter set (Snyder, USGS Prof. Paper
    1395 §14, ellipsoidal; angles in degrees)."""

    def __init__(self, lat0, lon0, lat1, lat2, fe, fn, a=_A, f=_F):
        self.lat0, self.lon0 = lat0, lon0
        self.fe, self.fn = fe, fn
        self.a = a
        self.e2 = f * (2.0 - f)
        self.e = float(np.sqrt(self.e2))

        def m(phi):
            s = np.sin(phi)
            return np.cos(phi) / np.sqrt(1.0 - self.e2 * s * s)

        p0, p1, p2 = map(np.radians, (lat0, lat1, lat2))
        m1, m2 = m(p1), m(p2)
        q0, q1, q2 = self._q(p0), self._q(p1), self._q(p2)
        self.n = float((m1 * m1 - m2 * m2) / (q2 - q1))
        self.C = float(m1 * m1 + self.n * q1)
        self.rho0 = float(a * np.sqrt(self.C - self.n * q0) / self.n)

    def _q(self, phi):
        """Snyder 3-12: authalic-latitude q function."""
        s = np.sin(phi)
        return (1.0 - self.e2) * (
            s / (1.0 - self.e2 * s * s)
            - (1.0 / (2.0 * self.e))
            * np.log((1.0 - self.e * s) / (1.0 + self.e * s))
        )


#: Common Albers CRSs (parameters from the public EPSG registry).
ALBERS_EPSG: dict[int, AlbersParams] = {
    # NAD83 / Conus Albers (USGS national products)
    5070: AlbersParams(23.0, -96.0, 29.5, 45.5, 0.0, 0.0),
    # GDA94 / Australian Albers
    3577: AlbersParams(0.0, 132.0, -18.0, -36.0, 0.0, 0.0),
}


def albers_forward(lon, lat, p: AlbersParams):
    """(lon, lat) degrees -> Albers (easting, northing). Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    q = p._q(phi)
    rho = p.a * np.sqrt(p.C - p.n * q) / p.n
    theta = p.n * np.radians(lon - p.lon0)
    return p.fe + rho * np.sin(theta), p.fn + p.rho0 - rho * np.cos(theta)


def albers_inverse(x, y, p: AlbersParams):
    """Albers (easting, northing) -> (lon, lat) degrees. Vectorized; the
    latitude series inverts q(phi) by Snyder 3-16 Newton iteration (10
    rounds: comfortably double precision over the defined domain, so the
    forward->inverse round trip is identity to ~1e-11 degrees)."""
    x = np.asarray(x, dtype=np.float64) - p.fe
    y = p.rho0 - (np.asarray(y, dtype=np.float64) - p.fn)
    rho = np.hypot(x, y)
    theta = np.arctan2(np.sign(p.n) * x, np.sign(p.n) * y)
    q = (p.C - (rho * p.n / p.a) ** 2) / p.n
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(10):
        s = np.sin(phi)
        d = 1.0 - p.e2 * s * s
        phi = phi + (d * d / (2.0 * np.cos(phi))) * (
            q / (1.0 - p.e2)
            - s / d
            + (1.0 / (2.0 * p.e))
            * np.log((1.0 - p.e * s) / (1.0 + p.e * s))
        )
    lon = p.lon0 + np.degrees(theta / p.n)
    return lon, np.degrees(phi)


class PolarStereoParams:
    """Polar Stereographic Variant B parameter set (EPSG method 9829;
    Snyder PP1395 §21): defined by the standard parallel ``lat_ts`` whose
    sign selects the aspect (negative = south pole), the longitude of
    origin, and false easting/northing. Angles in degrees."""

    def __init__(self, lat_ts, lon0, fe, fn, a=_A, f=_F):
        self.south = lat_ts < 0
        self.lon0, self.fe, self.fn = lon0, fe, fn
        self.a = a
        self.e2 = f * (2.0 - f)
        self.e = float(np.sqrt(self.e2))
        e = self.e
        pf = np.radians(abs(lat_ts))
        sf = np.sin(pf)
        tf = np.tan(np.pi / 4.0 - pf / 2.0) * (
            (1.0 + e * sf) / (1.0 - e * sf)
        ) ** (e / 2.0)
        mf = np.cos(pf) / np.sqrt(1.0 - self.e2 * sf * sf)
        #: sqrt((1+e)^(1+e) (1-e)^(1-e)) — shared by rho and k0
        self._ee = float(
            np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        )
        self.k0 = float(mf * self._ee / (2.0 * tf))


#: Common polar CRSs (parameters from the public EPSG registry).
POLAR_EPSG: dict[int, PolarStereoParams] = {
    # WGS 84 / Antarctic Polar Stereographic
    3031: PolarStereoParams(-71.0, 0.0, 0.0, 0.0),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic North
    3413: PolarStereoParams(70.0, -45.0, 0.0, 0.0),
}


def polar_forward(lon, lat, p: PolarStereoParams):
    """(lon, lat) degrees -> polar-stereographic (easting, northing).
    Vectorized. South aspect works on the mirrored hemisphere (phi, theta
    negated), which is exactly Snyder's south-case formula set."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - p.lon0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    if p.south:
        phi, lam = -phi, -lam
    e, s = p.e, np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) * (
        (1.0 + e * s) / (1.0 - e * s)
    ) ** (e / 2.0)
    rho = 2.0 * p.a * p.k0 * t / p._ee
    x = rho * np.sin(lam)
    y = -rho * np.cos(lam)
    if p.south:
        x, y = -x, -y
    return p.fe + x, p.fn + y


def polar_inverse(x, y, p: PolarStereoParams):
    """Polar-stereographic (easting, northing) -> (lon, lat) degrees.
    Vectorized; latitude via the conformal-to-geodetic series (exact to
    ~1e-9 deg for the WGS84 eccentricity — far inside the round-trip
    tolerance)."""
    dx = np.asarray(x, dtype=np.float64) - p.fe
    dy = np.asarray(y, dtype=np.float64) - p.fn
    if p.south:
        dx, dy = -dx, -dy
    rho = np.hypot(dx, dy)
    t = rho * p._ee / (2.0 * p.a * p.k0)
    chi = np.pi / 2.0 - 2.0 * np.arctan(t)
    e2 = p.e2
    e4, e6, e8 = e2 * e2, e2**3, e2**4
    phi = (
        chi
        + (e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0)
        * np.sin(2.0 * chi)
        + (7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0)
        * np.sin(4.0 * chi)
        + (7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0) * np.sin(6.0 * chi)
        + (4279.0 * e8 / 161280.0) * np.sin(8.0 * chi)
    )
    lam = np.arctan2(dx, -dy)
    if p.south:
        phi, lam = -phi, -lam
    return p.lon0 + np.degrees(lam), np.degrees(phi)


# ------------------------------------------------------------ EPSG dispatch


def supported_epsg(srid: int) -> bool:
    """Can transform_to_4326 handle this SRID without pyproj?"""
    return (
        srid == 3857
        or 32601 <= srid <= 32660
        or 32701 <= srid <= 32760
        or srid in LCC_EPSG
        or srid in ALBERS_EPSG
        or srid in POLAR_EPSG
    )


def transform_to_4326(srid: int):
    """Vectorized (x, y) -> (lon, lat) callable for a supported SRID, or
    None. Mirrors pyproj.Transformer.from_crs(srid, 4326, always_xy=True)
    for EPSG:3857, the WGS84 UTM zones, and the registered LCC CRSs."""
    if srid == 3857:
        return webmercator_inverse
    if 32601 <= srid <= 32660:
        zone = srid - 32600
        return lambda x, y: utm_inverse(x, y, zone, south=False)
    if 32701 <= srid <= 32760:
        zone = srid - 32700
        return lambda x, y: utm_inverse(x, y, zone, south=True)
    if srid in LCC_EPSG:
        p = LCC_EPSG[srid]
        return lambda x, y: lcc_inverse(x, y, p)
    if srid in ALBERS_EPSG:
        ap = ALBERS_EPSG[srid]
        return lambda x, y: albers_inverse(x, y, ap)
    if srid in POLAR_EPSG:
        pp = POLAR_EPSG[srid]
        return lambda x, y: polar_inverse(x, y, pp)
    return None
