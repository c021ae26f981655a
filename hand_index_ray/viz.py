"""Self-contained HTML QA map — the engine's analog of the reference's
folium visualization (/root/reference/viz/query_visualization.py:178-472)
without folium, network tiles, or any dependency: the three validation
sets (query ROI / intersecting / kept) render as inline SVG polygons in
a single portable .html file. Hover shows per-catchment id + overlap %
(SVG <title> tooltips); a legend carries the reference's count summary
(viz:459-472).

Pure string templating over the validation GeoJSON — no Ray, no pixel
rasterization; polygons are drawn in an equirectangular lon/lat frame
(adequate for QA at catchment extents, like the reference's web map).
"""

from __future__ import annotations

import html as _html
import json
import os

_COLORS = {
    # reference palette intent: ROI outline, candidates, kept subset
    "query": ("#d62728", "none", 2.0),
    "intersecting": ("#ff7f0e", "#ff7f0e33", 1.0),
    "kept": ("#2ca02c", "#2ca02c66", 1.2),
}

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 1rem; }}
 .legend span {{ display: inline-block; margin-right: 1.2em; }}
 .swatch {{ display: inline-block; width: 0.9em; height: 0.9em;
            border-radius: 2px; vertical-align: -0.1em;
            margin-right: 0.35em; }}
 svg {{ border: 1px solid #ccc; background: #fafafa; }}
 path:hover {{ stroke-width: 3; }}
</style></head><body>
<h2>{title}</h2>
<div class="legend">{legend}</div>
<svg viewBox="0 0 {w} {h}" width="{w}" height="{h}">
{paths}
</svg>
<p>{summary}</p>
</body></html>
"""


def _proj(lon: float, lat: float, bbox, w: int, h: int, pad: int):
    minx, miny, maxx, maxy = bbox
    sx = (w - 2 * pad) / max(maxx - minx, 1e-12)
    sy = (h - 2 * pad) / max(maxy - miny, 1e-12)
    s = min(sx, sy)
    return (pad + (lon - minx) * s, h - pad - (lat - miny) * s)


def _rings_of(geometry: dict):
    if geometry["type"] == "Polygon":
        return geometry["coordinates"]
    rings = []
    for poly in geometry["coordinates"]:  # MultiPolygon
        rings.extend(poly)
    return rings


def render_validation_html(fc: dict, out_path: str,
                           title: str = "ROI validation QA map",
                           width: int = 900, height: int = 600) -> dict:
    """Render a validation FeatureCollection (the `validate
    --geojson-out` artifact: features tagged set=query/intersecting/
    kept) to one self-contained HTML file. Returns per-set counts."""
    feats = fc["features"]
    xs, ys = [], []
    for f in feats:
        for ring in _rings_of(f["geometry"]):
            for lon, lat in ring:
                xs.append(lon)
                ys.append(lat)
    if not xs:
        raise ValueError("empty FeatureCollection")
    bbox = (min(xs), min(ys), max(xs), max(ys))
    pad = 15

    counts = {"query": 0, "intersecting": 0, "kept": 0}
    paths = []
    # draw order: intersecting under kept under the ROI outline
    order = {"intersecting": 0, "kept": 1, "query": 2}
    for f in sorted(feats, key=lambda f: order.get(
            f["properties"].get("set", ""), 0)):
        props = f["properties"]
        which = props.get("set", "intersecting")
        counts[which] = counts.get(which, 0) + 1
        stroke, fill, sw = _COLORS.get(which, _COLORS["intersecting"])
        d = []
        for ring in _rings_of(f["geometry"]):
            pts = [_proj(lon, lat, bbox, width, height, pad)
                   for lon, lat in ring]
            d.append("M " + " L ".join(f"{x:.2f} {y:.2f}"
                                       for x, y in pts) + " Z")
        if which == "query":
            tip = f"query ROI (threshold {props.get('threshold_pct')}%)"
        else:
            tip = (f"{props.get('catchment_id', '?')} — "
                   f"overlap {props.get('overlap_pct', 0):.2f}% ({which})")
        paths.append(
            f'<path d="{" ".join(d)}" stroke="{stroke}" fill="{fill}" '
            f'stroke-width="{sw}" fill-rule="evenodd">'
            f'<title>{_html.escape(tip)}</title></path>')

    legend = "".join(
        f'<span><i class="swatch" style="background:{_COLORS[k][0]}"></i>'
        f"{k} ({counts.get(k, 0)})</span>"
        for k in ("query", "intersecting", "kept"))
    summary = (f"{counts.get('intersecting', 0) + counts.get('kept', 0)} "
               f"intersecting candidates; {counts.get('kept', 0)} kept "
               f"after the overlap filter; "
               f"{counts.get('intersecting', 0)} removed.")
    page = _PAGE.format(title=_html.escape(title), legend=legend,
                        w=width, h=height, paths="\n".join(paths),
                        summary=summary)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write(page)
    return counts


def render_validation_html_from_file(geojson_path: str, out_path: str,
                                     **kw) -> dict:
    with open(geojson_path) as fh:
        return render_validation_html(json.load(fh), out_path, **kw)
