"""WKT emit/parse (kernels/wkt.py)."""

import numpy as np
import pytest

from hand_index_ray.kernels import wkb, wkt


def _sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s],
                     [x0, y0 + s], [x0, y0]], float)


def test_polygon_emit_and_parse():
    r = wkb.from_parts([[[_sq(1, 2, 3)]]])
    (s,) = wkt.encode_wkt(r)
    assert s == "POLYGON ((1 2, 4 2, 4 5, 1 5, 1 2))"
    back = wkt.decode_wkt([s])
    np.testing.assert_array_equal(back.coords, r.coords)


def test_hole_and_multipolygon():
    r = wkb.from_parts([[[_sq(0, 0, 10), _sq(2, 2, 1)]],
                        [[_sq(0, 0, 1)], [_sq(5, 5, 2)]]])
    s = wkt.encode_wkt(r)
    assert s[0].startswith("POLYGON ((0 0") and ", (2 2" in s[0]
    assert s[1].startswith("MULTIPOLYGON (((0 0")
    back = wkt.decode_wkt(s)
    np.testing.assert_array_equal(back.coords, r.coords)
    np.testing.assert_array_equal(back.geom_part_off, r.geom_part_off)
    np.testing.assert_array_equal(back.part_ring_off, r.part_ring_off)


def test_point_and_floats():
    r = wkb.from_parts([[[np.array([[1.5, -2.25]])]]])
    (s,) = wkt.encode_wkt(r)
    assert s == "POINT (1.5 -2.25)"
    back = wkt.decode_wkt([s])
    np.testing.assert_array_equal(back.coords, [[1.5, -2.25]])


def test_empty_and_errors():
    r = wkt.decode_wkt(["POLYGON EMPTY"])
    assert len(r) == 1 and len(r.coords) == 0
    assert wkt.encode_wkt(r) == ["POLYGON EMPTY"]
    with pytest.raises(ValueError):
        wkt.decode_wkt(["LINESTRING (0 0, 1 1)"])


def test_whitespace_tolerance():
    back = wkt.decode_wkt(["  polygon ( ( 0 0 , 2 0 , 2 2 , 0 2 , 0 0 ) )"])
    assert back.coords[2, 0] == 2.0
