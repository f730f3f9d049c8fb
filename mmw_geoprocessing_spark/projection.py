"""Closed-form coordinate reprojection between the reference's three
CRSs (Utils.scala:208-213): LatLng (EPSG:4326), WebMercator (EPSG:3857)
and ConusAlbers (EPSG:5070).

The reference reprojects every AOI from its vector CRS into the raster
CRS before rasterizing (Utils.scala:96-98,131-132) via GeoTrellis; this
container has no pyproj, so the transforms are implemented directly from
the published projection math (J.P. Snyder, *Map Projections — A Working
Manual*, USGS PP 1395: Albers pp. 101-102, Mercator pp. 41-44).

Vertex counts are request-sized (a polygon boundary), so these run
driver-side in pure python before rasterization; the pixel-scale work
stays on executors.

Accuracy: round-trip LatLng -> Albers -> LatLng is < 1e-9 degrees over
CONUS (property-tested in tests/test_geometry.py) — far below the
30 m cell size the reference operates at.
"""

from __future__ import annotations

import math

# GRS80 ellipsoid (EPSG:5070's datum, NAD83)
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2.0 - _F)
_E = math.sqrt(_E2)

# Conus Albers (EPSG:5070) parameters
_LAT1 = math.radians(29.5)  # standard parallel 1
_LAT2 = math.radians(45.5)  # standard parallel 2
_LAT0 = math.radians(23.0)  # latitude of origin
_LON0 = math.radians(-96.0)  # central meridian

# Web Mercator (EPSG:3857): spherical, radius = semi-major axis
_R_MERC = 6378137.0
_MAX_LAT = 85.06  # Web Mercator's square-world latitude clamp


def _q(sinphi: float) -> float:
    """Snyder eq. 3-12: authalic-latitude helper."""
    return (1.0 - _E2) * (
        sinphi / (1.0 - _E2 * sinphi * sinphi)
        - (1.0 / (2.0 * _E)) * math.log((1.0 - _E * sinphi) / (1.0 + _E * sinphi))
    )


def _m(phi: float) -> float:
    """Snyder eq. 14-15: cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - _E2 * s * s)


_M1 = _m(_LAT1)
_M2 = _m(_LAT2)
_Q0 = _q(math.sin(_LAT0))
_Q1 = _q(math.sin(_LAT1))
_Q2 = _q(math.sin(_LAT2))
_N = (_M1 * _M1 - _M2 * _M2) / (_Q2 - _Q1)  # Snyder eq. 14-8
_C = _M1 * _M1 + _N * _Q1  # Snyder eq. 14-13
_RHO0 = _A * math.sqrt(_C - _N * _Q0) / _N  # Snyder eq. 14-12a


def latlng_to_conus_albers(lon: float, lat: float) -> tuple[float, float]:
    """Forward Albers equal-area conic (Snyder eqs. 14-1..14-4)."""
    phi, lam = math.radians(lat), math.radians(lon)
    q = _q(math.sin(phi))
    rho = _A * math.sqrt(_C - _N * q) / _N
    theta = _N * (lam - _LON0)
    return rho * math.sin(theta), _RHO0 - rho * math.cos(theta)


def conus_albers_to_latlng(x: float, y: float) -> tuple[float, float]:
    """Inverse Albers (Snyder eqs. 14-10, 14-11, 3-16 iteration)."""
    rho = math.hypot(x, _RHO0 - y)
    theta = math.atan2(x, _RHO0 - y)
    q = (_C - (rho * _N / _A) ** 2) / _N
    lam = _LON0 + theta / _N
    # iterate Snyder eq. 3-16 for phi from q
    phi = math.asin(max(-1.0, min(1.0, q / 2.0)))
    for _ in range(15):
        s = math.sin(phi)
        denom = 1.0 - _E2 * s * s
        corr = (denom * denom / (2.0 * math.cos(phi))) * (
            q / (1.0 - _E2)
            - s / denom
            + (1.0 / (2.0 * _E)) * math.log((1.0 - _E * s) / (1.0 + _E * s))
        )
        phi += corr
        if abs(corr) < 1e-14:
            break
    return math.degrees(lam), math.degrees(phi)


def latlng_to_web_mercator(lon: float, lat: float) -> tuple[float, float]:
    """Forward spherical Mercator (Snyder eqs. 7-1, 7-2 with R = a)."""
    lat = max(-_MAX_LAT, min(_MAX_LAT, lat))
    x = _R_MERC * math.radians(lon)
    y = _R_MERC * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))
    return x, y


def web_mercator_to_latlng(x: float, y: float) -> tuple[float, float]:
    lon = math.degrees(x / _R_MERC)
    lat = math.degrees(2.0 * math.atan(math.exp(y / _R_MERC)) - math.pi / 2.0)
    return lon, lat


_TO_LATLNG = {
    "LatLng": lambda x, y: (x, y),
    "WebMercator": web_mercator_to_latlng,
    "ConusAlbers": conus_albers_to_latlng,
}
_FROM_LATLNG = {
    "LatLng": lambda lon, lat: (lon, lat),
    "WebMercator": latlng_to_web_mercator,
    "ConusAlbers": latlng_to_conus_albers,
}


def transform_point(x: float, y: float, src: str, dst: str) -> tuple[float, float]:
    """Transform one (x, y) between named CRSs, hubbed through LatLng."""
    if src == dst:
        return x, y
    lon, lat = _TO_LATLNG[src](x, y)
    return _FROM_LATLNG[dst](lon, lat)


def reproject_polygons(polys, src: str, dst: str):
    """Reproject a nested [poly][ring][(x, y)] structure (the shape
    ``geometry.parse_multipolygon`` returns)."""
    if src == dst:
        return polys
    return [
        [[transform_point(x, y, src, dst) for x, y in ring] for ring in poly]
        for poly in polys
    ]


def reproject_lines(lines, src: str, dst: str):
    """Reproject a [line][(x, y)] structure."""
    if src == dst:
        return lines
    return [[transform_point(x, y, src, dst) for x, y in line] for line in lines]
