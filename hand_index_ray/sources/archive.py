"""Archive sources: ZIP (stdlib zipfile) and TAR (stdlib tarfile) —
real image/document corpora ship as archives of small files far more
often than as loose trees; HTTP-range-readable ZIPs are a standard
dataset distribution. Shard law matches the other container sources
(sources/gpkg.py, las.py): the driver reads only the CENTRAL DIRECTORY
(zip) or one sequential header walk (tar) to learn the member list,
then emits member-index ranges; each shard opens the archive once
(per-actor handle cache) and extracts exactly its members — zip
members are random-access via the directory, so shards never touch
each other's bytes.

Output: one row per member — ``name | bytes | size | src_path`` —
feeding straight into the sniff-based decode stages (q168 pattern).
"""

from __future__ import annotations

import glob as _glob
import os
import tarfile
import zipfile

import pyarrow as pa

import ray.data


def _expand(paths) -> "list[str]":
    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    out: list[str] = []
    for p in paths:
        p = str(p)
        if any(ch in p for ch in "*?["):
            out.extend(sorted(_glob.glob(p, recursive=True)))
        else:
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no archives match {paths!r}")
    return out


class _ZipShardReader:
    def __init__(self):
        self._handles: dict[str, zipfile.ZipFile] = {}
        self._names: dict[str, list[str]] = {}

    def _open(self, path: str):
        z = self._handles.get(path)
        if z is None:
            z = self._handles[path] = zipfile.ZipFile(path, "r")
            self._names[path] = [i.filename for i in z.infolist()
                                 if not i.is_dir()]
        return z, self._names[path]

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, blobs, sizes, srcs = [], [], [], []
        for i in range(batch.num_rows):
            path = batch.column("path")[i].as_py()
            lo = int(batch.column("lo")[i].as_py())
            hi = int(batch.column("hi")[i].as_py())
            z, members = self._open(path)
            for m in members[lo:hi + 1]:
                data = z.read(m)
                names.append(m)
                blobs.append(data)
                sizes.append(len(data))
                srcs.append(path)
        return pa.table({"name": pa.array(names, pa.string()),
                         "bytes": pa.array(blobs, pa.binary()),
                         "size": pa.array(sizes, pa.int64()),
                         "src_path": pa.array(srcs, pa.string())})


class _TarShardReader:
    """Tar is sequential; each shard walks headers (cheap: 512-byte
    reads) and extracts only its member range."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        names, blobs, sizes, srcs = [], [], [], []
        for i in range(batch.num_rows):
            path = batch.column("path")[i].as_py()
            lo = int(batch.column("lo")[i].as_py())
            hi = int(batch.column("hi")[i].as_py())
            with tarfile.open(path, "r:*") as t:
                idx = -1
                for m in t:
                    if not m.isfile():
                        continue
                    idx += 1
                    if idx < lo:
                        continue
                    if idx > hi:
                        break
                    data = t.extractfile(m).read()
                    names.append(m.name)
                    blobs.append(data)
                    sizes.append(len(data))
                    srcs.append(path)
        return pa.table({"name": pa.array(names, pa.string()),
                         "bytes": pa.array(blobs, pa.binary()),
                         "size": pa.array(sizes, pa.int64()),
                         "src_path": pa.array(srcs, pa.string())})


def read_archive(paths, *, shard_members: int = 1024,
                 concurrency=(1, 16)) -> ray.data.Dataset:
    """ZIP/TAR file(s)/glob(s) → Dataset of (name, bytes, size,
    src_path). Format chosen per file by suffix/magic."""
    expanded = _expand(paths)
    zip_shards, tar_shards = [], []
    for path in expanded:
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                n = sum(1 for i in z.infolist() if not i.is_dir())
            target = zip_shards
        else:
            with tarfile.open(path, "r:*") as t:
                n = sum(1 for m in t if m.isfile())
            target = tar_shards
        for s in range(0, n, shard_members):
            target.append({"path": path, "lo": s,
                           "hi": min(s + shard_members - 1, n - 1)})
    parts = []
    if zip_shards:
        parts.append(ray.data.from_items(zip_shards).map_batches(
            _ZipShardReader, batch_format="pyarrow", batch_size=4,
            concurrency=concurrency))
    if tar_shards:
        parts.append(ray.data.from_items(tar_shards).map_batches(
            _TarShardReader, batch_format="pyarrow", batch_size=4,
            concurrency=concurrency))
    if not parts:
        raise FileNotFoundError(f"no members in {paths!r}")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def read_webdataset(paths, *, shard_members: int = 1024,
                    concurrency=(1, 16)) -> ray.data.Dataset:
    """WebDataset-style paired-member reader: members sharing a stem
    ("000123.png" + "000123.txt" + ...) group into ONE row
    ``key | <ext>: bytes ...`` — the tar-shard convention large
    image+caption corpora actually ship in. Stems must not straddle
    shard boundaries for exactness; shards are member ranges rounded
    to stem groups (zip: directory order; tar: archive order — the
    WebDataset contract is that a sample's members are adjacent)."""
    ds = read_archive(paths, shard_members=shard_members,
                      concurrency=concurrency)

    def group(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # names are tiny strings — parse them in Python; the (large)
        # blobs never leave Arrow: each ext column is a take() of the
        # original binary array by member index.
        names = t.column("name").to_pylist()
        stems, exts = [], []
        for n in names:
            base = n.rsplit("/", 1)[-1]
            stem, _, ext = base.rpartition(".")
            if not stem:
                stem, ext = base, ""
            stems.append(stem)
            exts.append(ext)
        order = list(dict.fromkeys(stems))
        pos = {s: i for i, s in enumerate(order)}
        blobs = t.column("bytes").combine_chunks()
        cols: dict = {"key": pa.array(order, pa.string())}
        for e in dict.fromkeys(exts):
            idx = np.zeros(len(order), dtype=np.int64)
            mask = np.zeros(len(order), dtype=bool)
            for i, (s, x) in enumerate(zip(stems, exts)):
                if x == e:
                    j = pos[s]
                    idx[j] = i
                    mask[j] = True
            col = blobs.take(pa.array(idx, pa.int64()))
            if not mask.all():
                col = pc.if_else(pa.array(mask), col,
                                 pa.scalar(None, col.type))
            cols[e] = col
        return pa.table(cols)

    # batch_size=None → batches follow the shard readers' blocks, so a
    # sample's adjacent members stay in one group call (choose
    # shard_members as a multiple of members-per-sample)
    return ds.map_batches(group, batch_format="pyarrow", batch_size=None)
