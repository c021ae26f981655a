"""GeoJSONSeq (NDJSON Feature) source + sink."""

import json

import numpy as np
import pytest

from hand_index_ray.kernels import wkb
from hand_index_ray.sources import geojsonseq as gjs


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], float)


def _fixture(path, n=6):
    rag = wkb.from_parts([[[_sq(i, 2 * i, 1 + i % 3)]]
                          for i in range(1, n + 1)])
    props = [{"id": i, "name": f"f{i}", "w": i * 0.5}
             for i in range(1, n + 1)]
    gjs.write_geojsonseq(path, rag, props)
    return rag, props


def test_roundtrip(tmp_path, ray_session):
    p = str(tmp_path / "f.ndjson")
    rag, props = _fixture(p)
    first = open(p).readline()
    doc = json.loads(first)
    assert doc["type"] == "Feature"
    assert doc["geometry"]["type"] == "Polygon"
    assert doc["geometry"]["coordinates"][0][0] == [1, 2]  # bare ints
    df = gjs.read_geojsonseq(p).to_pandas().sort_values("id")
    assert list(df.id) == [1, 2, 3, 4, 5, 6]
    assert list(df.name) == [f"f{i}" for i in df.id]
    back = wkb.decode(list(df.sort_values("id").wkb))
    np.testing.assert_array_equal(
        np.sort(back.coords, axis=0), np.sort(rag.coords, axis=0))


def test_null_geometry_and_multipolygon(tmp_path, ray_session):
    p = str(tmp_path / "g.ndjson")
    lines = [
        json.dumps({"type": "Feature", "geometry": None,
                    "properties": {"id": 1}}),
        json.dumps({"type": "Feature", "geometry": {
            "type": "MultiPolygon",
            "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                            [[[5, 5], [7, 5], [7, 7], [5, 7], [5, 5]]]]},
            "properties": {"id": 2}}),
        json.dumps({"type": "Feature", "geometry": {
            "type": "Point", "coordinates": [3.5, 4]},
            "properties": {"id": 3}}),
    ]
    open(p, "w").write("\n".join(lines) + "\n")
    df = gjs.read_geojsonseq(p).to_pandas().sort_values("id")
    assert list(df.id) == [2, 3]  # null geometry dropped
    r = wkb.decode(list(df.wkb))
    assert r.geom_slice(0).num_parts() == 2
    df2 = gjs.read_geojsonseq(p, drop_null_geom=False).to_pandas()
    assert len(df2) == 3


def test_errors(tmp_path, ray_session):
    p = str(tmp_path / "bad.ndjson")
    open(p, "w").write(json.dumps({"type": "FeatureCollection"}) + "\n")
    with pytest.raises(Exception):
        gjs.read_geojsonseq(p).to_pandas()
