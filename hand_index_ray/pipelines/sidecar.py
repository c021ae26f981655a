"""Build-time sidecar attach — reference J3 as a real pipeline.

Reference behavior (load.py:37-45, 206-253): glob the HAND output tree
for hydrotable CSVs and REM / catchment rasters, extract the branch-dir
prefix from each path (``regexp_extract(file, '(.*/branches/[^/]+/)')``
at load.py:208; ``--calb`` switches both the glob and the extract
pattern to one directory level under the root, load.py:42,208),
equi-join the extracted key onto ``Catchments(branch_path)`` —
``SELECT DISTINCT`` for hydrotables only (load.py:210-217), plain join
for the two raster tables (load.py:226-233, 242-249) — and persist the
three pointer tables (schema/hand-index-ver-fim100.sql:13-26).

Ray-native shape: the file listing (``pyarrow.fs`` — the same call
works against a local root or any FileSystem handle, SURVEY §2.3 ST4)
becomes a Dataset of paths; the pattern filter and key extraction are
Arrow regex kernels inside ``map_batches``; the catchments catalog
(branch_path → catchment_id, the small side) broadcasts once via the
object store; DISTINCT is a slim keyed shuffle (relational.distinct).
Nothing loops over files on the driver.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import DEFAULT, EngineConfig


@dataclass(frozen=True)
class SidecarPatterns:
    """File-match + branch-extract regexes for one HAND tree layout.

    ``for_root`` mirrors the reference glob set exactly (load.py:41-45):
    gpkg/rasters live under ``<root>/*/branches/*/``; hydrotable CSVs
    live there too unless ``calb``, which hoists them to ``<root>/*/``
    and widens the extract pattern (load.py:42,208)."""

    hydro_file: str
    hydro_extract: str
    rem_file: str
    catch_file: str
    branch_extract: str = r"(?P<branch>.*/branches/[^/]+/)"

    @staticmethod
    def for_root(root: str, calb: bool = False) -> "SidecarPatterns":
        r = re.escape(root.rstrip("/"))
        branch_dir = rf"{r}/[^/]+/branches/[^/]+"
        return SidecarPatterns(
            hydro_file=(rf"^{r}/[^/]+/hydroTable_[^/]*\.csv$" if calb
                        else rf"^{branch_dir}/hydroTable_[^/]*\.csv$"),
            hydro_extract=(r"(?P<branch>.*/[^/]+/)" if calb
                           else r"(?P<branch>.*/branches/[^/]+/)"),
            rem_file=rf"^{branch_dir}/[^/]*rem_zeroed[^/]*\.tif$",
            catch_file=rf"^{branch_dir}/[^/]*gw_catchments_reaches[^/]*\.tif$",
        )


def list_files(root: str, filesystem=None) -> list[str]:
    """Recursive file listing through ``pyarrow.fs`` — local paths and
    URI-addressed remote filesystems take the same code path (ST4
    filesystem passthrough; the reference's s3fs handle at load.py:94)."""
    from pyarrow import fs as pafs

    if filesystem is None:
        if "://" in root:
            filesystem, root = pafs.FileSystem.from_uri(root)
        else:
            filesystem = pafs.LocalFileSystem()
    sel = pafs.FileSelector(root, recursive=True)
    return sorted(fi.path for fi in filesystem.get_file_info(sel)
                  if fi.type == pafs.FileType.File)


def _matched_keyed(files: ray.data.Dataset, file_re: str, extract_re: str,
                   path_out: str) -> ray.data.Dataset:
    """Filter paths by regex, extract the branch key (Arrow kernels)."""

    schema = pa.schema([(path_out, pa.string()), ("branch_path", pa.string())])

    def f(t: pa.Table) -> pa.Table:
        paths = t.column("path")
        keep = pc.match_substring_regex(paths, file_re)
        sub = paths.filter(keep)
        if len(sub) == 0:
            return schema.empty_table()
        branch = pc.struct_field(pc.extract_regex(sub, extract_re), "branch")
        return pa.table({path_out: pc.cast(sub, pa.string()),
                         "branch_path": pc.cast(branch, pa.string())}, schema=schema)

    return files.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def attach_sidecars(source: "str | list[str] | ray.data.Dataset",
                    catchments: "str | pa.Table",
                    out_dir: str | None = None,
                    calb: bool = False,
                    root: str | None = None,
                    filesystem=None,
                    out_filesystem=None,
                    cfg: EngineConfig = DEFAULT) -> dict[str, ray.data.Dataset]:
    """Build the three sidecar pointer tables from a file tree.

    ``source``: a tree root to list (str), an explicit path list, or a
    Dataset with a ``path`` column. ``catchments``: the catalog parquet
    path or an Arrow table carrying (catchment_id, branch_path).
    Returns {name: Dataset}; with ``out_dir`` also writes
    ``<out>/<name>.parquet`` (single-file, like the reference's
    ``COPY {table} TO`` at load.py:289-299).
    """
    if isinstance(source, str):
        if root is None:
            # list_files strips the URI scheme (FileSystem.from_uri returns
            # scheme-less paths), so the match patterns must anchor at the
            # stripped root, not the original "s3://..." spelling.
            if filesystem is None and "://" in source:
                from pyarrow import fs as pafs

                _, root = pafs.FileSystem.from_uri(source)
            else:
                root = source
        paths = list_files(source, filesystem)
        files = ray.data.from_items([{"path": p} for p in paths])
    elif isinstance(source, list):
        if root is None:
            raise ValueError("root= required when passing an explicit path list")
        files = ray.data.from_items([{"path": p} for p in source])
    else:
        if root is None:
            raise ValueError("root= required when passing a Dataset")
        files = source
    pats = SidecarPatterns.for_root(root, calb)

    if isinstance(catchments, str):
        import pyarrow.parquet as pq

        cat = pq.read_table(catchments, columns=["catchment_id", "branch_path"],
                            filesystem=out_filesystem)
    else:
        cat = catchments.select(["catchment_id", "branch_path"])

    from ..relational import broadcast_join, distinct

    def build(file_re: str, extract_re: str, path_col: str,
              dedup: bool) -> ray.data.Dataset:
        keyed = _matched_keyed(files, file_re, extract_re, path_col)
        joined = broadcast_join(keyed, cat, keys="branch_path") \
            .select_columns(["catchment_id", path_col])
        return distinct(joined, ["catchment_id", path_col]) if dedup else joined

    out = {
        # DISTINCT only for hydrotables (reference load.py:212)
        "hydrotables": build(pats.hydro_file, pats.hydro_extract, "csv_path", True),
        "rem_rasters": build(pats.rem_file, pats.branch_extract, "raster_path", False),
        "catchment_rasters": build(pats.catch_file, pats.branch_extract, "raster_path", False),
    }
    if out_dir:
        from ..state.fsio import FS
        from .query import write_single_file

        FS(out_filesystem).mkdirs(out_dir)
        path_col = {"hydrotables": "csv_path", "rem_rasters": "raster_path",
                    "catchment_rasters": "raster_path"}
        written = {}
        for name, ds in out.items():
            sch = pa.schema([("catchment_id", pa.string()),
                             (path_col[name], pa.string())])
            write_single_file(ds, FS.join(out_dir, f"{name}.parquet"),
                              schema=sch, filesystem=out_filesystem)
            written[name] = ray.data.read_parquet(
                FS.join(out_dir, f"{name}.parquet"),
                filesystem=out_filesystem)
        return written
    return out
