"""Versioned schema registry — the engine analog of the reference's
``--schema-path`` DDL indirection (load.py:307-311,357-361; README.md
describes HAND-version migration by swapping the DDL file + loader).

Schemas are pyarrow.Schema objects declared in code and keyed by a
version id. Migration = register a new version side-by-side and point
the pipeline at it (``EngineConfig.schema_version``), exactly like the
reference swaps ``hand-index-ver-fim100.sql`` for a newer DDL. The
``fim100`` tables mirror schema/hand-index-ver-fim100.sql:5-26 column
for column (geometry stays opaque WKB binary, :8).
"""

from __future__ import annotations

import pyarrow as pa

_FIM100 = {
    # schema/hand-index-ver-fim100.sql:5-11 (+ engine-added geom_count)
    "catchments": pa.schema([
        ("catchment_id", pa.string()),
        ("hand_version_id", pa.string()),
        ("geometry", pa.binary()),
        ("h3_index", pa.uint64()),
        ("branch_path", pa.string()),
    ]),
    # …sql:13-16
    "hydrotables": pa.schema([
        ("catchment_id", pa.string()),
        ("csv_path", pa.string()),
    ]),
    # …sql:18-21
    "rem_rasters": pa.schema([
        ("catchment_id", pa.string()),
        ("raster_path", pa.string()),
    ]),
    # …sql:23-26
    "catchment_rasters": pa.schema([
        ("catchment_id", pa.string()),
        ("raster_path", pa.string()),
    ]),
}

_IMAGES_V1 = {
    # BASELINE.json input_hint + Lance-style lineage columns
    "images": pa.schema([
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("fragment_id", pa.int32()),
        ("row_idx", pa.int64()),
    ]),
}

_REGISTRY: dict[str, dict[str, pa.Schema]] = {
    "fim100": _FIM100,
    "images-v1": _IMAGES_V1,
}


def versions() -> list[str]:
    return sorted(_REGISTRY)


def register(version: str, tables: dict[str, pa.Schema]) -> None:
    """Add a new schema version (the migration hook). Existing versions
    are immutable — re-registering raises."""
    if version in _REGISTRY:
        raise ValueError(f"schema version {version!r} already registered")
    _REGISTRY[version] = dict(tables)


def get_schema(version: str, table: str) -> pa.Schema:
    try:
        tables = _REGISTRY[version]
    except KeyError:
        raise KeyError(f"unknown schema version {version!r}; have {versions()}") from None
    try:
        return tables[table]
    except KeyError:
        raise KeyError(f"schema version {version!r} has no table {table!r}; "
                       f"have {sorted(tables)}") from None


def validate_table(tbl: pa.Table, version: str, table: str,
                   allow_extra: bool = True) -> None:
    """Raise with a column-level diff if ``tbl`` doesn't conform to the
    registered schema. ``allow_extra`` tolerates engine-added columns
    (the reference's query side is schema-on-read for extras,
    query_geojson.py:144)."""
    want = get_schema(version, table)
    problems = []
    for field in want:
        if field.name not in tbl.column_names:
            problems.append(f"missing column {field.name!r} ({field.type})")
            continue
        got_t = tbl.schema.field(field.name).type
        if got_t != field.type:
            problems.append(f"column {field.name!r}: expected {field.type}, got {got_t}")
    if not allow_extra:
        extra = set(tbl.column_names) - {f.name for f in want}
        if extra:
            problems.append(f"unexpected columns {sorted(extra)}")
    if problems:
        raise ValueError(
            f"table does not conform to schema {version}/{table}: " + "; ".join(problems))
