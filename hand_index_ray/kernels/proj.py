"""EPSG:5070 (NAD83 / Conus Albers) ↔ EPSG:4326 reprojection, vectorized.

The reference stores geometry in EPSG:5070 and reprojects at the
boundary with DuckDB's ``ST_Transform(..., 'EPSG:5070', 'EPSG:4326',
true)`` (reference load.py:165-166, query_geojson.py:59-62). No proj
library is available in this sandbox, so the Albers Equal-Area Conic
formulas (Snyder, "Map Projections — A Working Manual", USGS PP 1395,
eqs. 14-1..14-24) are vendored here as vectorized numpy.

EPSG:5070 parameters: GRS80 ellipsoid (a=6378137, 1/f=298.257222101),
standard parallels 29.5°N / 45.5°N, latitude of origin 23°N, central
meridian 96°W, false easting/northing 0.
"""

from __future__ import annotations

import numpy as np

# GRS80
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = 2.0 * _F - _F * _F
_E = np.sqrt(_E2)

_LAT1 = np.deg2rad(29.5)
_LAT2 = np.deg2rad(45.5)
_LAT0 = np.deg2rad(23.0)
_LON0 = np.deg2rad(-96.0)


def _q(sin_lat: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: authalic q for given sin(latitude)."""
    es = _E * sin_lat
    return (1.0 - _E2) * (
        sin_lat / (1.0 - _E2 * sin_lat * sin_lat)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
    )


def _m(lat: float) -> float:
    """Snyder eq. 14-15: m = cosφ / sqrt(1 − e² sin²φ)."""
    s = np.sin(lat)
    return np.cos(lat) / np.sqrt(1.0 - _E2 * s * s)


_M1 = _m(_LAT1)
_M2 = _m(_LAT2)
_Q0 = float(_q(np.sin(_LAT0)))
_Q1 = float(_q(np.sin(_LAT1)))
_Q2 = float(_q(np.sin(_LAT2)))
_N = (_M1 * _M1 - _M2 * _M2) / (_Q2 - _Q1)  # Snyder 14-14
_C = _M1 * _M1 + _N * _Q1  # Snyder 14-13
_RHO0 = _A * np.sqrt(_C - _N * _Q0) / _N  # Snyder 14-12a


def lonlat_to_albers(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees → EPSG:5070 meters (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    q = _q(np.sin(np.deg2rad(lat)))
    rho = _A * np.sqrt(np.maximum(_C - _N * q, 0.0)) / _N
    theta = _N * (np.deg2rad(lon) - _LON0)
    x = rho * np.sin(theta)
    y = _RHO0 - rho * np.cos(theta)
    return x, y


def albers_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:5070 meters → EPSG:4326 degrees (vectorized, iterative inverse)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dy = _RHO0 - y
    rho = np.hypot(x, dy)
    # n > 0 for EPSG:5070, so no sign flip of (x, dy) is needed.
    theta = np.arctan2(x, dy)
    q = (_C - (rho * _N / _A) ** 2) / _N  # Snyder 14-19
    # Snyder 3-16 iteration for φ from q.
    ratio = np.clip(q / 2.0, -1.0, 1.0)
    lat = np.arcsin(ratio)
    for _ in range(6):
        s = np.sin(lat)
        es = _E * s
        one = 1.0 - _E2 * s * s
        corr = (one * one / (2.0 * np.cos(lat))) * (
            q / (1.0 - _E2)
            - s / one
            + (1.0 / (2.0 * _E)) * np.log((1.0 - es) / (1.0 + es))
        )
        lat = lat + corr
    lon = _LON0 + theta / _N
    return np.rad2deg(lon), np.rad2deg(lat)
