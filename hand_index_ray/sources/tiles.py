"""Tile-table source dispatch: Lance or Parquet, one call.

The production target is a Lance table of image+caption pairs (the
north-star input container; Lance is columnar like Parquet but adds
fast random access + versioning, and Ray Data ships a native
``read_lance``). This sandbox has no ``lance`` wheel, so the engine is
developed and tested against Parquet directories with the identical
schema — ``read_tiles`` is the single seam where a production deploy
flips containers without touching any pipeline code:

- ``*.lance`` path (or a directory with Lance's ``_versions/`` layout)
  → ``ray.data.read_lance(uri, columns=..., filter=...)``; raises a
  clear ``RuntimeError`` if the ``lance`` package is absent.
- anything else → ``ray.data.read_parquet`` with the same column
  pruning (predicates are applied by the caller's map_batches stages;
  Parquet row-group pruning still happens via ``columns=``).

Both branches return a streaming ``ray.data.Dataset`` over Arrow
blocks — downstream decode/encode stages are container-agnostic.

Reference parity: the reference globs GPKG/CSV/TIF trees from local or
s3 paths (load.py:327-341); here the container seam plays that role
for the tile table, and ``pipelines/sidecar.py`` handles the
file-tree side.
"""

from __future__ import annotations

import os

import ray.data


def is_lance_path(path: str) -> bool:
    """A ``.lance`` suffix, or an existing directory in Lance's
    on-disk layout (``_versions/`` manifest directory)."""
    if path.rstrip("/").endswith(".lance"):
        return True
    probe = os.path.join(path, "_versions")
    try:
        return os.path.isdir(probe)
    except OSError:
        return False


def read_tiles(path: str, *, columns: list[str] | None = None,
               lance_filter: str | None = None,
               override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read an image+caption tile table from Lance or Parquet.

    ``columns`` prunes at the read on both containers. ``lance_filter``
    is a Lance SQL predicate pushed into the scan (ignored for Parquet
    — callers express predicates as map_batches filters, which both
    containers stream through anyway).
    """
    if is_lance_path(path):
        try:
            import lance  # noqa: F401  (ray.data.read_lance needs it)
        except ImportError as e:
            raise RuntimeError(
                f"{path!r} is a Lance table but the 'lance' package is not "
                "installed in this environment; install pylance or convert "
                "the table to a Parquet directory (schema-identical; see "
                "sources/tiles.py docstring)") from e
        return ray.data.read_lance(
            path, columns=columns, filter=lance_filter,
            override_num_blocks=override_num_blocks)
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=override_num_blocks)
