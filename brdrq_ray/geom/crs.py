"""Coordinate reference system transforms (Lambert Conformal Conic 2SP +
7-parameter Helmert datum shift), vectorized over numpy coordinate arrays.

The engine — like the reference — runs every pipeline in ONE projected meter
CRS (reference: plugin/brdrq/brdrq_utils.py:1498-1502 mandates a projected
CRS and the docs standardize on Belgian Lambert 72, EPSG:31370; QGIS performs
the reprojection at the edges). This module is that edge: ingest data that
arrives in geographic WGS84 (the shape OSM/GeoJSON interchange uses) into the
working grid, and emit results back out. Everything here is a pure function
of published constants:

- **Lambert Conformal Conic (2SP)** forward/inverse — formulas from IOGP
  Guidance Note 7 part 2 (EPSG dataset coordinate-conversion methods,
  EPSG method 9802). The published worked example (NAD27 / Texas South
  Central) is pinned in tests as the external oracle.
- **Geographic <-> geocentric** conversion (EPSG method 9602), iterative
  inverse; worked example from the same note pinned in tests.
- **7-parameter Helmert** (position-vector EPSG 9606 / coordinate-frame
  EPSG 9607 — same matrix, opposite rotation signs). The inverse uses the
  EXACT matrix inverse (np.linalg.inv of the 3x3 once), not the
  negated-parameter approximation, so forward∘inverse roundtrips to float
  precision — the property the reproject tests rely on.
- **EPSG:31370 preset** — International 1924 ellipsoid + the Belgian NGI
  projection constants, chained with the published BD72->WGS84 Helmert
  (EPSG transformation 15929, coordinate-frame convention).

Scale shape: transforms are embarrassingly parallel — the dataset-level op
(functions/geometry_ops.reproject_geometries) concatenates every ring of a
batch into ONE (n, 2) array, applies the transform once, and repacks; nothing
shuffles and no per-row Python touches coordinates. Reprojection is an
ingress/egress operation: the interior of a pipeline stays in one projected
CRS (tiles.py world window), so reproject never appears between stages.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

_ARCSEC = math.pi / (180.0 * 3600.0)


# ---------------------------------------------------------------------------
# ellipsoids
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Ellipsoid:
    a: float      # semi-major axis (meters unless the projection says else)
    inv_f: float  # inverse flattening

    @property
    def f(self) -> float:
        return 1.0 / self.inv_f

    @property
    def e2(self) -> float:
        f = self.f
        return f * (2.0 - f)

    @property
    def e(self) -> float:
        return math.sqrt(self.e2)


WGS84 = Ellipsoid(a=6378137.0, inv_f=298.257223563)
INTERNATIONAL_1924 = Ellipsoid(a=6378388.0, inv_f=297.0)  # Hayford
# Clarke 1866 in US survey feet as the EPSG worked example states it
# (a = 20925832.16 ft, e^2 = 0.00676866); inv_f derived from f = 1-sqrt(1-e2)
_CLARKE_E2 = 0.00676866
CLARKE_1866_USFT = Ellipsoid(
    a=20925832.16, inv_f=1.0 / (1.0 - math.sqrt(1.0 - _CLARKE_E2)))


# ---------------------------------------------------------------------------
# Lambert Conformal Conic, two standard parallels (EPSG method 9802)
# ---------------------------------------------------------------------------

def _m(phi: float, e: float) -> float:
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - (e * s) ** 2)


def _t_scalar(phi: float, e: float) -> float:
    s = math.sin(phi)
    return (math.tan(math.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def _t_array(phi: np.ndarray, e: float) -> np.ndarray:
    s = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


@dataclass(frozen=True)
class LambertConformal2SP:
    """Lambert Conic Conformal (2SP). Angles in RADIANS at construction;
    use :meth:`from_degrees` for the usual definition. ``forward`` maps
    (lon, lat) degrees -> (easting, northing); ``inverse`` maps back."""

    ellipsoid: Ellipsoid
    lat_f: float    # latitude of false origin (rad)
    lon_f: float    # longitude of false origin (rad)
    lat_1: float    # first standard parallel (rad)
    lat_2: float    # second standard parallel (rad)
    fe: float       # false easting
    fn: float       # false northing

    @classmethod
    def from_degrees(cls, ellipsoid: Ellipsoid, lat_f: float, lon_f: float,
                     lat_1: float, lat_2: float, fe: float, fn: float):
        r = math.radians
        return cls(ellipsoid, r(lat_f), r(lon_f), r(lat_1), r(lat_2), fe, fn)

    # derived constants (computed lazily; dataclass is frozen so cache on
    # first use via object.__setattr__)
    def _consts(self):
        got = getattr(self, "_c", None)
        if got is not None:
            return got
        e = self.ellipsoid.e
        a = self.ellipsoid.a
        m1 = _m(self.lat_1, e)
        m2 = _m(self.lat_2, e)
        t1 = _t_scalar(self.lat_1, e)
        t2 = _t_scalar(self.lat_2, e)
        tf = _t_scalar(self.lat_f, e)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        big_f = m1 / (n * t1 ** n)
        rf = a * big_f * tf ** n if tf > 0.0 else 0.0
        c = (e, a, n, big_f, rf)
        object.__setattr__(self, "_c", c)
        return c

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees -> (E, N). Vectorized; scalars pass through."""
        e, a, n, big_f, rf = self._consts()
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        t = _t_array(phi, e)
        r = a * big_f * np.power(t, n)
        theta = n * (lam - self.lon_f)
        east = self.fe + r * np.sin(theta)
        north = self.fn + rf - r * np.cos(theta)
        return east, north

    def inverse(self, east, north):
        """(E, N) -> (lon, lat) degrees. Iterative latitude (converges to
        <1e-12 rad in ~5 iterations; fixed 10 for determinism)."""
        e, a, n, big_f, rf = self._consts()
        x = np.asarray(east, dtype=np.float64) - self.fe
        y = rf - (np.asarray(north, dtype=np.float64) - self.fn)
        r = np.sign(n) * np.hypot(x, y)
        t = np.power(r / (a * big_f), 1.0 / n)
        theta = np.arctan2(np.sign(n) * x, np.sign(n) * y)
        lam = theta / n + self.lon_f
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(10):
            s = e * np.sin(phi)
            phi = (np.pi / 2.0
                   - 2.0 * np.arctan(t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)))
        return np.degrees(lam), np.degrees(phi)


#: EPSG:31370 "Belge Lambert 72" — NGI projection constants.
BELGIAN_LAMBERT_72 = LambertConformal2SP.from_degrees(
    INTERNATIONAL_1924,
    lat_f=90.0,
    lon_f=4.0 + 22.0 / 60.0 + 2.952 / 3600.0,       # 4deg 22' 02.952" E
    lat_1=51.0 + 10.0 / 60.0 + 0.00204 / 3600.0,    # 51deg 10' 00.00204" N
    lat_2=49.0 + 50.0 / 60.0 + 0.00204 / 3600.0,    # 49deg 50' 00.00204" N
    fe=150000.013, fn=5400088.438)


# ---------------------------------------------------------------------------
# geographic <-> geocentric (EPSG method 9602)
# ---------------------------------------------------------------------------

def geodetic_to_geocentric(ell: Ellipsoid, lon_deg, lat_deg, h=0.0):
    """(lon, lat) degrees [+ellipsoidal height] -> (X, Y, Z) meters."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    h = np.asarray(h, dtype=np.float64)
    s = np.sin(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    x = (nu + h) * np.cos(phi) * np.cos(lam)
    y = (nu + h) * np.cos(phi) * np.sin(lam)
    z = (nu * (1.0 - ell.e2) + h) * s
    return x, y, z


def geocentric_to_geodetic(ell: Ellipsoid, x, y, z):
    """(X, Y, Z) -> (lon, lat) degrees + height. Fixed-point latitude
    iteration (12 rounds — |err| < 1e-12 rad for any terrestrial point)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1.0 - ell.e2))
    for _ in range(12):
        s = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
        phi = np.arctan2(z + ell.e2 * nu * s, p)
    s = np.sin(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    h = p / np.cos(phi) - nu
    return np.degrees(lam), np.degrees(phi), h


# ---------------------------------------------------------------------------
# 7-parameter Helmert (EPSG 9606 position vector / 9607 coordinate frame)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Helmert:
    """dX/dY/dZ in meters, rotations in ARCSECONDS, scale in ppm.
    ``convention`` is 'position_vector' or 'coordinate_frame' (the EPSG
    pair — identical matrix with opposite rotation signs)."""

    dx: float
    dy: float
    dz: float
    rx_sec: float
    ry_sec: float
    rz_sec: float
    ds_ppm: float
    convention: str = "position_vector"

    def _matrix(self) -> np.ndarray:
        rx = self.rx_sec * _ARCSEC
        ry = self.ry_sec * _ARCSEC
        rz = self.rz_sec * _ARCSEC
        if self.convention == "coordinate_frame":
            rx, ry, rz = -rx, -ry, -rz
        elif self.convention != "position_vector":
            raise ValueError(f"unknown convention: {self.convention}")
        scale = 1.0 + self.ds_ppm * 1e-6
        return scale * np.array([[1.0, -rz, ry],
                                 [rz, 1.0, -rx],
                                 [-ry, rx, 1.0]])

    @staticmethod
    def _mul(m: np.ndarray, x, y, z):
        # explicit elementwise expansion, NOT a BLAS matmul: matmul picks
        # different kernels by shape, so the same point would transform to
        # different last-ulp values depending on batch size — a partition-
        # invariance hazard for geometry fingerprints downstream.
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        return (m[0, 0] * x + m[0, 1] * y + m[0, 2] * z,
                m[1, 0] * x + m[1, 1] * y + m[1, 2] * z,
                m[2, 0] * x + m[2, 1] * y + m[2, 2] * z)

    def apply(self, x, y, z):
        qx, qy, qz = self._mul(self._matrix(), x, y, z)
        return qx + self.dx, qy + self.dy, qz + self.dz

    def apply_inverse(self, x, y, z):
        """EXACT inverse (matrix inverse, not negated parameters) so
        apply∘apply_inverse is identity to float rounding."""
        m = np.linalg.inv(self._matrix())
        return self._mul(m,
                         np.asarray(x, dtype=np.float64) - self.dx,
                         np.asarray(y, dtype=np.float64) - self.dy,
                         np.asarray(z, dtype=np.float64) - self.dz)


#: EPSG transformation 15929 "BD72 to WGS 84 (3)" (NGI, coordinate frame).
BD72_TO_WGS84 = Helmert(dx=-106.8686, dy=52.2978, dz=-103.7239,
                        rx_sec=0.3366, ry_sec=-0.457, rz_sec=1.8422,
                        ds_ppm=-1.2747, convention="coordinate_frame")


# ---------------------------------------------------------------------------
# the EPSG:31370 <-> EPSG:4326 chain
# ---------------------------------------------------------------------------

def lambert72_to_wgs84(east, north):
    """EPSG:31370 (E, N) meters -> WGS84 (lon, lat) degrees. Vectorized.
    Chain: LCC inverse on International 1924 -> geocentric -> Helmert
    (EPSG 15929) -> geodetic on WGS84. Heights are treated as 0 on the
    source datum (the engine's geometries are 2D — M2 drops Z)."""
    lon, lat = BELGIAN_LAMBERT_72.inverse(east, north)
    x, y, z = geodetic_to_geocentric(INTERNATIONAL_1924, lon, lat)
    x, y, z = BD72_TO_WGS84.apply(x, y, z)
    lon, lat, _h = geocentric_to_geodetic(WGS84, x, y, z)
    return lon, lat


def wgs84_to_lambert72(lon_deg, lat_deg):
    """WGS84 (lon, lat) degrees -> EPSG:31370 (E, N) meters. Like the
    forward chain (and like PROJ's towgs84 handling of 2D coordinates),
    the ellipsoidal height is taken as 0 on the SOURCE datum of each
    direction — the two directions are therefore inverse only up to that
    convention: roundtripping a Belgian coordinate moves it < 1 mm (the
    height dropped after the shift is ~40 m, whose horizontal projection
    through the rotation is sub-millimeter; pinned in tests)."""
    x, y, z = geodetic_to_geocentric(WGS84, lon_deg, lat_deg)
    x, y, z = BD72_TO_WGS84.apply_inverse(x, y, z)
    lon, lat, _h = geocentric_to_geodetic(INTERNATIONAL_1924, x, y, z)
    return BELGIAN_LAMBERT_72.forward(lon, lat)


#: name -> (forward to WGS84 lon/lat, inverse from WGS84 lon/lat)
_TRANSFORMS = {
    ("EPSG:31370", "EPSG:4326"): lambert72_to_wgs84,
    ("EPSG:4326", "EPSG:31370"): wgs84_to_lambert72,
}


def transform_fn(src: str, dst: str):
    """Resolve a (src, dst) CRS pair to a vectorized (x, y) -> (x', y')
    function. Raises KeyError with the supported pairs listed."""
    try:
        return _TRANSFORMS[(src.upper(), dst.upper())]
    except KeyError:
        raise KeyError(
            f"no transform {src} -> {dst}; supported: "
            f"{sorted(_TRANSFORMS)}") from None
