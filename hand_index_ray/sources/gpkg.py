"""GeoPackage (OGC 12-128) vector source — the reference's PRIMARY
catchment input (S3): it globs ``*gw_catchments*.gpkg`` trees and reads
every geometry per file via DuckDB-spatial ``ST_Read``
(/root/reference/load.py:41,67,143). This module is the real thing on
stdlib ``sqlite3`` — a GeoPackage is an SQLite database with three
registry tables and a 'GP'-headed geometry BLOB per feature — no GDAL,
no third-party wheel.

Reader design (Ray-Data-first):
- driver opens each file ONCE (read-only, immutable) to list feature
  tables from ``gpkg_contents``/``gpkg_geometry_columns`` and the rowid
  span per table, then emits (path, table, rowid_lo, rowid_hi) shards →
  ``from_items`` → ``map_batches(_GpkgShardReader)`` actor pool. Each
  shard SELECTs its rowid range; sqlite rowid-range scans are index
  scans, so shards never re-read each other's pages.
- per-actor sqlite connection cache (a table of shards over the same
  file reuses one handle — the reference found GPKG seek latency is
  what kills remote reads, load.py:15).
- remote filesystems: GPKG is a seek-heavy container, so a non-local
  ``pyarrow.fs`` source is spooled to a local scratch file once per
  (worker, file) then opened — exactly the reference's measured
  download-then-read-locally strategy (load.py:15,113).

The GeoPackageBinary header ('GP', version, flags[byte-order |
envelope-indicator | empty-bit], srs_id, optional envelope doubles) is
parsed per blob; the payload after the envelope is standard WKB,
handed to ``kernels/wkb`` downstream unchanged.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import os
import sqlite3
import struct
import tempfile

import numpy as np
import pyarrow as pa

import ray.data

GPKG_APPLICATION_ID = 0x47504B47  # 'GPKG'
GPKG_USER_VERSION = 10300  # GeoPackage 1.3.0

# envelope-contents indicator (flags bits 1-3) -> number of doubles
_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}

_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
    'AUTHORITY["EPSG","4326"]]'
)

_SQLITE_AFFINITY = {
    "INTEGER": pa.int64(), "INT": pa.int64(), "MEDIUMINT": pa.int64(),
    "SMALLINT": pa.int64(), "TINYINT": pa.int64(), "BIGINT": pa.int64(),
    "BOOLEAN": pa.int64(),
    "REAL": pa.float64(), "DOUBLE": pa.float64(), "FLOAT": pa.float64(),
    "TEXT": pa.string(), "DATETIME": pa.string(), "DATE": pa.string(),
    "BLOB": pa.binary(),
}


def _quote_ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


# ---------------------------------------------------------------------------
# writer (spec-correct fixture generator — the sandbox ships no .gpkg files)


def write_gpkg(path: str, table: str, fids, wkb_blobs, props: dict | None = None,
               *, srs_id: int = 4326, geometry_type: str = "POLYGON",
               envelopes: "np.ndarray | None" = None) -> None:
    """Write a minimal-but-valid GeoPackage: application_id/user_version
    pragmas, the three mandatory ``gpkg_*`` registry tables with the
    three mandatory SRS rows, and one feature table whose ``geom``
    column holds GeoPackageBinary blobs (flags: little-endian, XY
    envelope when ``envelopes`` given else no envelope).

    ``wkb_blobs`` entries may be None (NULL geometry — the reference
    filters these with WHERE geom IS NOT NULL, load.py:143).
    ``envelopes`` is an (n, 4) [minx, maxx, miny, maxy] array (GPKG
    envelope order, spec §2.1.3.1.1).
    """
    props = props or {}
    if os.path.exists(path):
        os.unlink(path)
    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {GPKG_APPLICATION_ID}")
        con.execute(f"PRAGMA user_version = {GPKG_USER_VERSION}")
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL,"
            " srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL,"
            " organization_coordsys_id INTEGER NOT NULL,"
            " definition TEXT NOT NULL, description TEXT)")
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_WKT, None),
             ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
             ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None)])
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY,"
            " data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT"
            " DEFAULT '', last_change DATETIME NOT NULL DEFAULT"
            " (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE,"
            " min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)")
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL,"
            " column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL,"
            " srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL,"
            " CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))")
        prop_cols = ", ".join(
            f"{_quote_ident(k)} {t}" for k, t in
            ((k, _sql_type_of(v)) for k, v in props.items()))
        con.execute(
            f"CREATE TABLE {_quote_ident(table)} (fid INTEGER PRIMARY KEY"
            f" AUTOINCREMENT, geom BLOB{', ' + prop_cols if prop_cols else ''})")
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " srs_id) VALUES (?,?,?,?)", (table, "features", table, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (table, "geom", geometry_type, srs_id))
        rows = []
        for i, (fid, blob) in enumerate(zip(fids, wkb_blobs)):
            if blob is None:
                gp = None
            elif envelopes is not None:
                # flags 0b00000011: XY envelope (indicator 1), little-endian
                gp = (b"GP\x00\x03" + struct.pack("<i", srs_id)
                      + struct.pack("<4d", *envelopes[i]) + bytes(blob))
            else:
                # flags 0b00000001: no envelope, little-endian
                gp = b"GP\x00\x01" + struct.pack("<i", srs_id) + bytes(blob)
            rows.append((int(fid), gp, *[props[k][i] for k in props]))
        ph = ",".join("?" * (2 + len(props)))
        cols = "fid, geom" + "".join(", " + _quote_ident(k) for k in props)
        con.executemany(
            f"INSERT INTO {_quote_ident(table)} ({cols}) VALUES ({ph})", rows)
        con.commit()
    finally:
        con.close()


def _sql_type_of(values) -> str:
    for v in values:
        if v is None:
            continue
        if isinstance(v, (bool, int, np.integer)):
            return "INTEGER"
        if isinstance(v, (float, np.floating)):
            return "REAL"
        if isinstance(v, (bytes, bytearray)):
            return "BLOB"
        return "TEXT"
    return "TEXT"


# ---------------------------------------------------------------------------
# blob header


def split_gp_header(blob: bytes) -> "tuple[int, bytes | None]":
    """Parse one GeoPackageBinary header; return (srs_id, wkb-bytes or
    None for the empty-geometry flag). Raises on bad magic/version and
    on the extended-GeoPackageBinary bit (no extension geometries here).
    """
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (bad magic)")
    if blob[2] != 0:
        raise ValueError(f"unsupported GeoPackageBinary version {blob[2]}")
    flags = blob[3]
    if flags & 0x20:
        raise ValueError("extended GeoPackageBinary not supported")
    order = "<" if flags & 0x01 else ">"
    env_ind = (flags >> 1) & 0x07
    if env_ind not in _ENV_DOUBLES:
        raise ValueError(f"invalid envelope indicator {env_ind}")
    srs_id = struct.unpack_from(order + "i", blob, 4)[0]
    if flags & 0x10:  # empty-geometry flag
        return srs_id, None
    return srs_id, blob[8 + 8 * _ENV_DOUBLES[env_ind]:]


# ---------------------------------------------------------------------------
# reader


def list_feature_tables(path: str) -> "list[tuple[str, str]]":
    """(table_name, geom_column) for every data_type='features' entry."""
    con = _open_ro(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, g.column_name FROM gpkg_contents c"
            " JOIN gpkg_geometry_columns g ON g.table_name = c.table_name"
            " WHERE c.data_type = 'features' ORDER BY c.table_name").fetchall()
    finally:
        con.close()
    return [(t, g) for t, g in rows]


def _open_ro(path: str) -> sqlite3.Connection:
    uri = "file:" + path.replace("?", "%3f").replace("#", "%23") \
        + "?mode=ro&immutable=1"
    return sqlite3.connect(uri, uri=True)


def _prop_schema(con: sqlite3.Connection, table: str,
                 geom_col: str) -> "list[tuple[str, pa.DataType]]":
    out = []
    for _, name, decl, *_ in con.execute(
            f"PRAGMA table_info({_quote_ident(table)})"):
        if name == geom_col:
            continue
        decl = (decl or "").split("(")[0].strip().upper()
        out.append((name, _SQLITE_AFFINITY.get(decl, pa.string())))
    return out


class _GpkgShardReader:
    """Actor-pool shard reader: per-actor sqlite connection cache
    (setup cost paid once per (actor, file), reference load.py:15
    latency finding), GP-header strip per feature, Arrow out."""

    def __init__(self, drop_null_geom: bool, spool_fs=None):
        self._conns: dict[str, sqlite3.Connection] = {}
        self._drop_null = drop_null_geom
        self._spool_fs = spool_fs
        self._spooled: dict[str, str] = {}

    def _conn(self, path: str) -> sqlite3.Connection:
        c = self._conns.get(path)
        if c is None:
            local = path
            if self._spool_fs is not None:
                local = self._spooled.get(path)
                if local is None:
                    local = _spool_to_local(self._spool_fs, path)
                    self._spooled[path] = local
            c = self._conns[path] = _open_ro(local)
        return c

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for i in range(batch.num_rows):
            path = batch.column("path")[i].as_py()
            table = batch.column("table")[i].as_py()
            lo = batch.column("lo")[i].as_py()
            hi = batch.column("hi")[i].as_py()
            geom_col = batch.column("geom_col")[i].as_py()
            con = self._conn(path)
            schema = _prop_schema(con, table, geom_col)
            cols = ", ".join([_quote_ident(geom_col)]
                             + [_quote_ident(n) for n, _ in schema])
            where = f"rowid >= {int(lo)} AND rowid <= {int(hi)}"
            if self._drop_null:
                where += f" AND {_quote_ident(geom_col)} IS NOT NULL"
            rows = con.execute(
                f"SELECT rowid, {cols} FROM {_quote_ident(table)}"
                f" WHERE {where} ORDER BY rowid").fetchall()
            fids = [r[0] for r in rows]
            wkbs, srss = [], []
            for r in rows:
                blob = r[1]
                if blob is None:
                    wkbs.append(None)
                    srss.append(None)
                else:
                    srs, w = split_gp_header(blob)
                    wkbs.append(w)
                    srss.append(srs)
            arrays = {
                "fid": pa.array(fids, pa.int64()),
                "wkb": pa.array(wkbs, pa.binary()),
                "srs_id": pa.array(srss, pa.int32()),
                "src_path": pa.array([path] * len(rows), pa.string()),
                "src_table": pa.array([table] * len(rows), pa.string()),
            }
            for j, (name, typ) in enumerate(schema):
                vals = [r[2 + j] for r in rows]
                if typ == pa.string():
                    vals = [None if v is None else str(v) for v in vals]
                arrays[name] = pa.array(vals, typ)
            tables.append(pa.table(arrays))
        if not tables:
            return pa.table({"fid": pa.array([], pa.int64())})
        return pa.concat_tables(tables, promote_options="default")


def _spool_to_local(fs, path: str) -> str:
    """Copy a remote GPKG to local scratch once (content-addressed by
    path+size so concurrent workers converge; atomic rename)."""
    info = fs.get_file_info(path)
    key = hashlib.sha256(f"{path}:{info.size}".encode()).hexdigest()[:24]
    spool_dir = os.path.join(tempfile.gettempdir(), "hand_index_ray_gpkg_spool")
    os.makedirs(spool_dir, exist_ok=True)
    local = os.path.join(spool_dir, key + ".gpkg")
    if os.path.exists(local):
        return local
    tmp = local + f".tmp.{os.getpid()}"
    with fs.open_input_stream(path) as src, open(tmp, "wb") as dst:
        while True:
            chunk = src.read(8 << 20)
            if not chunk:
                break
            dst.write(chunk)
    os.replace(tmp, local)
    return local


def read_gpkg(paths, *, table: str | None = None,
              drop_null_geom: bool = True, shard_rows: int = 65536,
              filesystem=None, concurrency=(1, 16)) -> ray.data.Dataset:
    """Read feature tables from one or more GeoPackages as a streaming
    Dataset of ``fid | wkb | srs_id | src_path | src_table | <props>``.

    ``paths`` is a path, a glob pattern (reference load.py:41 globs
    ``*gw_catchments*.gpkg`` trees), or a list of either. Shards are
    rowid ranges so one 10M-feature file parallelizes across the pool;
    shard discovery opens each file once on the driver (metadata-only:
    registry tables + MIN/MAX(rowid)). With ``filesystem=`` the files
    are spooled to worker-local scratch before opening (GPKG is
    seek-heavy; the reference measured local reads faster than remote,
    load.py:15).
    """
    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    expanded: list[str] = []
    for p in paths:
        p = str(p)
        if filesystem is None and any(ch in p for ch in "*?["):
            expanded.extend(sorted(_glob.glob(p, recursive=True)))
        else:
            expanded.append(p)
    if not expanded:
        raise FileNotFoundError(f"no GeoPackage files match {paths!r}")

    shards = []
    for path in expanded:
        local = path if filesystem is None else _spool_to_local(filesystem, path)
        tables = ([(table, _geom_col_of(local, table))] if table
                  else list_feature_tables(local))
        if not tables:
            raise ValueError(f"{path}: no feature tables in gpkg_contents")
        con = _open_ro(local)
        try:
            for tname, gcol in tables:
                lo_hi = con.execute(
                    f"SELECT MIN(rowid), MAX(rowid) FROM"
                    f" {_quote_ident(tname)}").fetchone()
                if lo_hi[0] is None:
                    continue
                lo, hi = int(lo_hi[0]), int(lo_hi[1])
                for s in range(lo, hi + 1, shard_rows):
                    shards.append({"path": path, "table": tname,
                                   "geom_col": gcol, "lo": s,
                                   "hi": min(s + shard_rows - 1, hi)})
        finally:
            con.close()
    ds = ray.data.from_items(shards)
    return ds.map_batches(
        _GpkgShardReader, fn_constructor_args=(drop_null_geom, filesystem),
        batch_format="pyarrow", batch_size=4, concurrency=concurrency)


def _geom_col_of(path: str, table: str) -> str:
    con = _open_ro(path)
    try:
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE"
            " table_name = ?", (table,)).fetchone()
    finally:
        con.close()
    return row[0] if row else "geom"
