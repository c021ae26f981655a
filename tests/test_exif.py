"""EXIF APP1 metadata (kernels/exif.py) — TIFF-IFD parse, orientation
transforms, GPS rationals, builder round-trip."""

import struct

import numpy as np
import pytest

from hand_index_ray.kernels import exif, jpeg


def _jpeg_with(app1: bytes) -> bytes:
    base = jpeg.encode(np.full((16, 16), 77, np.uint8), 90)
    return exif.insert_app1(base, app1)


def test_roundtrip_full_fields():
    app1 = exif.build_exif_app1(orientation=6, make="ACME", model="Cam-1",
                                datetime_str="2026:08:18 12:00:00",
                                lat=36.5, lon=-97.25)
    blob = _jpeg_with(app1)
    meta = exif.parse_exif(blob)
    assert meta["orientation"] == 6
    assert meta["make"] == "ACME" and meta["model"] == "Cam-1"
    assert meta["datetime"] == "2026:08:18 12:00:00"
    assert meta["gps_lat_deg"] == pytest.approx(36.5, abs=1e-6)
    assert meta["gps_lon_deg"] == pytest.approx(-97.25, abs=1e-6)
    # the stream still decodes (APPn skipped by the pixel decoder)
    assert jpeg.decode(blob).shape == (16, 16)


def test_exact_dms_rationals():
    app1 = exif.build_exif_app1(orientation=1, lat=-1.0, lon=1.0,
                                lat_dms=[(12, 1), (34, 1), (567800, 10000)],
                                lon_dms=[(98, 1), (7, 1), (60000, 10000)])
    meta = exif.parse_exif(_jpeg_with(app1))
    assert meta["gps_lat"] == [(12, 1), (34, 1), (567800, 10000)]
    assert meta["gps_lat_ref"] == "S" and meta["gps_lon_ref"] == "E"
    assert meta["gps_lat_deg"] == pytest.approx(
        -(12 + 34 / 60 + 56.78 / 3600), abs=1e-9)


def test_no_exif_and_malformed():
    plain = jpeg.encode(np.full((8, 8), 5, np.uint8), 90)
    assert exif.parse_exif(plain) == {}
    assert exif.parse_exif(b"\x89PNG") == {}
    with pytest.raises(ValueError):
        exif.parse_exif(b"\xff\xd8\xff\xe1\x00\x0aExif\x00\x00XX")


def test_big_endian_tiff():
    # hand-crafted MM (Motorola) TIFF: one IFD, orientation=8
    ifd = struct.pack(">H", 1) \
        + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 8) + b"\0\0" \
        + struct.pack(">I", 0)
    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd
    seg = b"Exif\x00\x00" + tiff
    app1 = b"\xFF\xE1" + struct.pack(">H", len(seg) + 2) + seg
    meta = exif.parse_exif(_jpeg_with(app1))
    assert meta["orientation"] == 8


def test_orientation_transforms_complete_dihedral():
    img = np.arange(48).reshape(6, 8)
    outs = [exif.apply_orientation(img, o) for o in range(1, 9)]
    # all 8 dihedral elements distinct on an asymmetric image
    assert len({o.tobytes() for o in outs}) == 8
    assert np.array_equal(outs[0], img)
    assert np.array_equal(outs[1], img[:, ::-1])
    assert np.array_equal(outs[2], np.rot90(img, 2))
    assert np.array_equal(outs[3], img[::-1])
    assert np.array_equal(outs[4], img.T)                 # main transpose
    assert np.array_equal(outs[5], np.rot90(img, -1))     # 90 CW
    assert np.array_equal(outs[6], img[::-1, ::-1].T)     # anti transpose
    assert np.array_equal(outs[7], np.rot90(img, 1))      # 90 CCW
    # unknown orientation values are identity, 3-channel images work
    assert np.array_equal(exif.apply_orientation(img, 0), img)
    rgb = np.dstack([img] * 3)
    assert exif.apply_orientation(rgb, 6).shape == (8, 6, 3)


def test_insert_app1_preserves_jfif_first():
    base = jpeg.encode(np.full((8, 8), 1, np.uint8), 90)
    out = exif.insert_app1(base, exif.build_exif_app1(orientation=3))
    assert out[2:4] == b"\xff\xe0"  # JFIF APP0 stays first
    assert exif.parse_exif(out)["orientation"] == 3
