"""GPX source: exact decimal parsing, writer/reader roundtrip,
multi-segment tracks (sources/gpx.py; driver query q178)."""

import numpy as np
import pytest

from hand_index_ray.sources import gpx as gpxlib


def test_scaled_int_exact():
    assert gpxlib._scaled_int("12.3456", 1_000_000) == 12_345_600
    assert gpxlib._scaled_int("-0.000001", 1_000_000) == -1
    assert gpxlib._scaled_int("35", 1_000_000) == 35_000_000
    assert gpxlib._scaled_int("1.239", 100) == 123  # truncates
    with pytest.raises(ValueError):
        gpxlib._scaled_int("1e5", 100)


def test_parse_handles_segments_and_missing_optionals():
    doc = b"""<?xml version="1.0"?>
    <gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1">
      <trk><trkseg>
        <trkpt lat="35.5" lon="-98.25"><ele>120.50</ele>
          <time>2020-09-13T12:00:00Z</time></trkpt>
        <trkpt lat="35.6" lon="-98.26"/>
      </trkseg><trkseg>
        <trkpt lat="36.0" lon="-99.0"><ele>-3.25</ele></trkpt>
      </trkseg></trk>
    </gpx>"""
    t = gpxlib.parse_gpx_bytes(doc, track_id=7)
    assert t.num_rows == 3
    assert t.column("track_id").to_pylist() == [7, 7, 7]
    assert t.column("seg").to_pylist() == [0, 0, 1]
    assert t.column("idx").to_pylist() == [0, 1, 0]
    assert t.column("lat_udeg").to_pylist() == [35_500_000, 35_600_000,
                                                36_000_000]
    assert t.column("ele_cm").to_pylist() == [12050, 0, -325]
    assert t.column("ts_us").to_pylist()[0] == 1_599_998_400 * 1_000_000
    assert t.column("ts_us").to_pylist()[1] == -1


def test_write_read_roundtrip(tmp_path, ray_session):
    pts = [(0, 35_001_000, -98_002_000, 1250, 1_600_000_000_000_000),
           (0, 35_003_000, -98_001_000, 1300, 1_600_000_060_000_000),
           (1, 35_100_000, -98_200_000, 900, -1)]
    p = str(tmp_path / "t.gpx")
    gpxlib.write_gpx(p, pts)
    ds = gpxlib.read_gpx([p])
    df = ds.to_pandas().sort_values(["seg", "idx"]).reset_index(drop=True)
    assert df["lat_udeg"].tolist() == [35_001_000, 35_003_000, 35_100_000]
    assert df["lon_udeg"].tolist() == [-98_002_000, -98_001_000,
                                       -98_200_000]
    assert df["ele_cm"].tolist() == [1250, 1300, 900]
    assert df["ts_us"].tolist() == [1_600_000_000_000_000,
                                    1_600_000_060_000_000, -1]
    assert df["seg"].tolist() == [0, 0, 1]
