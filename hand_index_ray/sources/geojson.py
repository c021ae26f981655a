"""GeoJSON ROI reader (reference S4: ``gpd.read_file`` + CRS
normalization at query_geojson.py:88-105), stdlib-json only.

Supports Feature / FeatureCollection / bare-geometry documents with
Polygon or MultiPolygon geometry. Mirrors the reference's CRS policy:
input is assumed EPSG:4326 when no CRS is declared (query_geojson.py:95);
a declared non-4326 CRS raises (no proj database is available here to
reproject arbitrary CRSs — the engine's storage-side 4326↔5070
transform lives in kernels/proj.py).
"""

from __future__ import annotations

import json

import numpy as np

from ..kernels import wkb


def _geometry_of(doc: dict) -> dict:
    t = doc.get("type")
    if t == "FeatureCollection":
        feats = doc.get("features") or []
        if not feats:
            raise ValueError("empty FeatureCollection")
        return _geometry_of(feats[0])  # first feature, like gpd.iloc[0]
    if t == "Feature":
        return doc["geometry"]
    return doc


def _check_crs(doc: dict) -> None:
    crs = doc.get("crs")
    if crs is None:
        return  # assume EPSG:4326 (reference query_geojson.py:95)
    name = str((crs.get("properties") or {}).get("name", ""))
    if any(tok in name for tok in ("4326", "CRS84")):
        return
    raise ValueError(f"unsupported GeoJSON CRS {name!r}: reproject to EPSG:4326 first")


def roi_from_geojson(source: "str | dict") -> wkb.Ragged:
    """Parse a GeoJSON file path / string / dict into a Ragged geometry
    (EPSG:4326 lon/lat). Returns the FIRST feature's polygon, exactly
    like the reference (``gdf.geometry.iloc[0]``, query_geojson.py:101).
    """
    if isinstance(source, dict):
        doc = source
    elif isinstance(source, str) and source.lstrip().startswith("{"):
        doc = json.loads(source)
    else:
        with open(source) as f:
            doc = json.load(f)
    _check_crs(doc)
    g = _geometry_of(doc)
    t = g.get("type")
    coords = g.get("coordinates")
    if t == "Polygon":
        parts = [[np.asarray(ring, dtype=np.float64) for ring in coords]]
    elif t == "MultiPolygon":
        parts = [[np.asarray(ring, dtype=np.float64) for ring in poly] for poly in coords]
    else:
        raise ValueError(f"unsupported GeoJSON geometry type {t!r}")
    return wkb.from_parts([parts])


def roi_ring_from_geojson(source: "str | dict") -> np.ndarray:
    """Outer ring of the first polygon — the shape most query APIs take."""
    rag = roi_from_geojson(source)
    c0, c1 = rag.ring_coord_off[0], rag.ring_coord_off[1]
    return rag.coords[c0:c1]
