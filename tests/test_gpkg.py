"""GeoPackage source: spec-correct writer + sharded sqlite3 reader
(reference S3 parity: load.py:41,67,143 glob + ST_Read per file)."""

import os
import sqlite3
import struct

import numpy as np
import pyarrow.fs as pafs
import pytest

from hand_index_ray.kernels import wkb
from hand_index_ray.sources import gpkg


def _square_wkb(x0, y0, side):
    return wkb.encode_box(np.array([x0], float), np.array([y0], float),
                          np.array([x0 + side], float),
                          np.array([y0 + side], float))[0]


def _write_fixture(path, n=10, table="gw_catchments", with_env=False):
    fids = list(range(1, n + 1))
    blobs = [None if f % 4 == 0 else _square_wkb(f, f * 2, 1 + f % 3)
             for f in fids]
    envs = None
    if with_env:
        envs = np.array([[f, f + 1 + f % 3, f * 2, f * 2 + 1 + f % 3]
                         for f in fids], float)
    gpkg.write_gpkg(path, table, fids, blobs,
                    props={"ht": [f * 10 for f in fids],
                           "name": [f"c{f}" for f in fids],
                           "w": [f * 0.5 for f in fids]},
                    envelopes=envs)
    return fids, blobs


def test_pragmas_and_registry(tmp_path):
    p = str(tmp_path / "a.gpkg")
    _write_fixture(p)
    con = sqlite3.connect(p)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    assert con.execute("PRAGMA user_version").fetchone()[0] == 10300
    assert con.execute("SELECT COUNT(*) FROM gpkg_spatial_ref_sys") \
        .fetchone()[0] == 3
    t, g = gpkg.list_feature_tables(p)[0]
    assert (t, g) == ("gw_catchments", "geom")
    con.close()


def test_roundtrip_and_null_policy(tmp_path, ray_session):
    p = str(tmp_path / "a.gpkg")
    fids, blobs = _write_fixture(p)
    df = gpkg.read_gpkg(p).to_pandas().sort_values("fid")
    # NULL geoms dropped (reference WHERE geom IS NOT NULL, load.py:143)
    assert list(df.fid) == [f for f in fids if f % 4 != 0]
    assert (df.srs_id == 4326).all()
    assert df.ht.dtype == np.int64 and df.w.dtype == np.float64
    assert list(df.name) == [f"c{f}" for f in df.fid]
    # WKB survives header strip byte-exactly
    want = {f: b for f, b in zip(fids, blobs) if b is not None}
    for f, w in zip(df.fid, df.wkb):
        assert bytes(w) == want[f]
    # keep-null mode
    df2 = gpkg.read_gpkg(p, drop_null_geom=False).to_pandas()
    assert len(df2) == len(fids) and df2.wkb.isna().sum() == len(fids) // 4


def test_envelope_header_and_area(tmp_path, ray_session):
    p = str(tmp_path / "e.gpkg")
    _write_fixture(p, with_env=True)
    df = gpkg.read_gpkg(p).to_pandas()
    r = wkb.decode(list(df.wkb))
    areas = []
    for g in range(len(r)):
        c = r.geom_slice(g).coords
        areas.append((c[:, 0].max() - c[:, 0].min())
                     * (c[:, 1].max() - c[:, 1].min()))
    want = [(1 + f % 3) ** 2 for f in df.fid]
    assert areas == want


def test_sharding_many_files(tmp_path, ray_session):
    for b in range(3):
        _write_fixture(str(tmp_path / f"b{b}_gw_catchments.gpkg"), n=9)
    ds = gpkg.read_gpkg(str(tmp_path / "*gw_catchments*.gpkg"), shard_rows=4)
    df = ds.to_pandas()
    assert len(df) == 3 * 7  # 9 minus two null-geom rows, per file
    assert df.src_path.nunique() == 3


def test_header_variants():
    # big-endian header
    blob = b"GP\x00\x00" + struct.pack(">i", 4326) + b"\x01\x02"
    srs, w = gpkg.split_gp_header(blob)
    assert srs == 4326 and w == b"\x01\x02"
    # empty-geometry flag
    srs, w = gpkg.split_gp_header(b"GP\x00\x11" + struct.pack("<i", 0))
    assert w is None
    with pytest.raises(ValueError):
        gpkg.split_gp_header(b"XX\x00\x01\x00\x00\x00\x00")
    with pytest.raises(ValueError):  # extended bit
        gpkg.split_gp_header(b"GP\x00\x21" + struct.pack("<i", 0))
    with pytest.raises(ValueError):  # bad version
        gpkg.split_gp_header(b"GP\x09\x01" + struct.pack("<i", 0))


def test_remote_fs_spool(tmp_path, ray_session):
    """Bucket-style keys that do NOT exist relative to cwd: any os.*
    open of the raw key would fail; the reader must spool via the FS
    (reference download-then-read strategy, load.py:15,113)."""
    root = tmp_path / "bucket"
    (root / "data").mkdir(parents=True)
    _write_fixture(str(root / "data" / "x.gpkg"), n=6)
    fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    assert not os.path.exists("data/x.gpkg")
    df = gpkg.read_gpkg(["data/x.gpkg"], filesystem=fs).to_pandas()
    assert sorted(df.fid) == [1, 2, 3, 5, 6]


def test_explicit_table_and_empty(tmp_path, ray_session):
    p = str(tmp_path / "t.gpkg")
    _write_fixture(p, table="zones")
    df = gpkg.read_gpkg(p, table="zones").to_pandas()
    assert len(df) > 0
    with pytest.raises(FileNotFoundError):
        gpkg.read_gpkg(str(tmp_path / "nope*.gpkg"))
