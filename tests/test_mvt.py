"""Mapbox Vector Tile codec (kernels/mvt.py, spec 2.1)."""

import numpy as np
import pytest

from hand_index_ray.kernels import mvt


def test_varint_zigzag():
    for v in (0, 1, 127, 128, 300, 2 ** 40):
        got, pos = mvt._read_varint(mvt._varint(v), 0)
        assert got == v and pos == len(mvt._varint(v))
    for v in (0, -1, 1, -64, 63, 2 ** 31, -2 ** 31):
        assert mvt._unzigzag(mvt._zigzag(v)) == v


def test_polygon_roundtrip_with_hole():
    outer = np.array([[10, 10], [110, 10], [110, 110], [10, 110]])
    hole = np.array([[40, 40], [40, 60], [60, 60], [60, 40]])
    blob = mvt.encode_tile([{
        "name": "catch",
        "features": [{"id": 7, "type": mvt.POLYGON,
                      "geometry": [[outer, hole]],
                      "tags": {"ht": 42, "name": "a", "w": 2.5,
                               "ok": True}}],
    }])
    layers = mvt.decode_tile(blob)
    assert len(layers) == 1
    ly = layers[0]
    assert ly["name"] == "catch" and ly["extent"] == 4096
    f = ly["features"][0]
    assert f["id"] == 7 and f["type"] == mvt.POLYGON
    assert f["tags"] == {"ht": 42, "name": "a", "w": 2.5, "ok": True}
    parts = f["geometry"]
    assert len(parts) == 1 and len(parts[0]) == 2
    # winding enforced: exterior positive area, hole negative
    ext, hl = parts[0]
    assert mvt._ring_area2(ext[:, 0], ext[:, 1]) > 0
    assert mvt._ring_area2(hl[:, 0], hl[:, 1]) < 0
    assert set(map(tuple, ext)) == set(map(tuple, outer))
    assert set(map(tuple, hl)) == set(map(tuple, hole))


def test_multipolygon_part_grouping():
    a = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    b = np.array([[100, 100], [120, 100], [120, 120], [100, 120]])
    blob = mvt.encode_tile([{"name": "m", "features": [
        {"type": mvt.POLYGON, "geometry": [[a], [b]]}]}])
    parts = mvt.decode_tile(blob)[0]["features"][0]["geometry"]
    assert len(parts) == 2 and all(len(p) == 1 for p in parts)


def test_points_and_lines():
    pts = np.array([[5, 5], [9, 2]])
    blob = mvt.encode_tile([{"name": "p", "features": [
        {"type": mvt.POINT, "geometry": pts},
        {"type": mvt.LINESTRING,
         "geometry": [np.array([[0, 0], [4, 4], [8, 0]]),
                      np.array([[1, 1], [2, 2]])]},
    ]}])
    feats = mvt.decode_tile(blob)[0]["features"]
    np.testing.assert_array_equal(feats[0]["geometry"], pts)
    assert len(feats[1]["geometry"]) == 2
    np.testing.assert_array_equal(feats[1]["geometry"][1],
                                  [[1, 1], [2, 2]])


def test_value_dictionary_dedup():
    f = [{"type": mvt.POINT, "geometry": np.array([[i, i]]),
          "tags": {"cls": "road", "z": 3}} for i in range(50)]
    blob = mvt.encode_tile([{"name": "d", "features": f}])
    # 50 features share one key/value table entry each — the blob grows
    # by the per-feature overhead only, far below 50 copies of strings
    assert blob.count(b"road") == 1
    out = mvt.decode_tile(blob)[0]["features"]
    assert all(x["tags"] == {"cls": "road", "z": 3} for x in out)


def test_closed_ring_input_and_extent():
    sq = np.array([[0, 0], [8, 0], [8, 8], [0, 8], [0, 0]])  # closed
    blob = mvt.encode_tile([{"name": "e", "extent": 512, "features": [
        {"type": mvt.POLYGON, "geometry": [[sq]]}]}])
    ly = mvt.decode_tile(blob)[0]
    assert ly["extent"] == 512
    assert len(ly["features"][0]["geometry"][0][0]) == 4  # open ring


def test_errors():
    with pytest.raises(ValueError):
        mvt._decode_geometry(mvt.POLYGON, [(2 & 0x7) | (1 << 3), 0, 0])
    bad = bytearray(mvt.encode_tile([{"name": "x", "features": []}]))
    # flip version varint to 1
    i = bad.index(b"\x78")  # field 15 wire 0
    bad[i + 1] = 1
    with pytest.raises(ValueError):
        mvt.decode_tile(bytes(bad))
