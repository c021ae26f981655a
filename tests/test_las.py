"""LAS 1.2 point-cloud source (ASPRS spec): writer/reader roundtrip,
format 0/1, record-range sharding, oversized-record tolerance."""

import struct

import numpy as np
import pytest

from hand_index_ray.sources import las


def _pts(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(-10000, 10000, n), rng.integers(0, 20000, n),
            rng.integers(0, 5000, n))


def test_header_and_roundtrip(tmp_path, ray_session):
    p = str(tmp_path / "a.las")
    xi, yi, zi = _pts(100)
    las.write_las(p, xi, yi, zi, intensity=np.arange(100) % 1024,
                  cls=np.arange(100) % 8, scale=(0.01, 0.01, 0.001),
                  offset=(1000.0, 2000.0, 50.0))
    h = las.read_header(p)
    assert h["version"] == (1, 2) and h["n_points"] == 100
    assert h["point_format"] == 0 and h["record_length"] == 20
    df = las.read_las(p).to_pandas()
    np.testing.assert_array_equal(np.sort(df.xi), np.sort(xi))
    np.testing.assert_array_equal(df.classification, np.arange(100) % 8)
    np.testing.assert_allclose(df.x, df.xi * 0.01 + 1000.0)
    np.testing.assert_allclose(df.z, df.zi * 0.001 + 50.0)
    assert (df.return_number == 1).all() and (df.n_returns == 1).all()


def test_format1_gps_time(tmp_path, ray_session):
    p = str(tmp_path / "b.las")
    xi, yi, zi = _pts(10, 1)
    t = np.arange(10) * 0.5
    las.write_las(p, xi, yi, zi, point_format=1, gps_time=t)
    assert las.read_header(p)["record_length"] == 28
    df = las.read_las(p).to_pandas()
    np.testing.assert_allclose(np.sort(df.gps_time), t)


def test_sharding(tmp_path, ray_session):
    p = str(tmp_path / "c.las")
    xi, yi, zi = _pts(1000, 2)
    las.write_las(p, xi, yi, zi)
    df = las.read_las(p, shard_points=128).to_pandas()
    assert len(df) == 1000
    assert int(df.xi.sum()) == int(xi.sum())


def test_extra_record_bytes(tmp_path, ray_session):
    """Record length larger than the format's minimum (spec allows
    extra bytes): reader slices the known prefix."""
    p = str(tmp_path / "d.las")
    xi, yi, zi = _pts(5, 3)
    las.write_las(p, xi, yi, zi)
    raw = bytearray(open(p, "rb").read())
    # rewrite with 24-byte records (4 pad bytes)
    recs = [raw[227 + i * 20:227 + (i + 1) * 20] + b"\x00" * 4
            for i in range(5)]
    struct.pack_into("<H", raw, 105, 24)
    open(p, "wb").write(bytes(raw[:227]) + b"".join(recs))
    df = las.read_las(p).to_pandas()
    np.testing.assert_array_equal(np.sort(df.yi), np.sort(yi))


def test_errors(tmp_path):
    p = str(tmp_path / "e.las")
    open(p, "wb").write(b"NOPE" + b"\x00" * 300)
    with pytest.raises(ValueError):
        las.read_header(p)
    xi, yi, zi = _pts(3, 4)
    las.write_las(p, xi, yi, zi)
    raw = bytearray(open(p, "rb").read())
    raw[104] = 0x80  # LAZ compression bit
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        las.read_header(p)
    with pytest.raises(FileNotFoundError):
        las.read_las(str(tmp_path / "zz*.las"))
